"""Positional embedding utilities (2-D sin-cos, interpolation/resize).

Behavioral equivalents of reference ``src/open_clip/pos_embed.py:20-96`` and the
pos-embed resize in ``src/open_clip/model.py:790-855``, built on numpy/jax.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def get_1d_sincos_pos_embed_from_grid(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=float)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000 ** omega  # (D/2,)
    out = np.einsum("m,d->md", pos.reshape(-1), omega)  # (M, D/2)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)  # (M, D)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int, cls_token: bool = False) -> np.ndarray:
    """(grid*grid [+1], embed_dim) fixed sin-cos table, matching reference pos_embed.py:20."""
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)  # w goes first
    grid = np.stack(grid, axis=0).reshape([2, 1, grid_size, grid_size])
    emb_h = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[0])
    emb_w = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[1])
    pos_embed = np.concatenate([emb_h, emb_w], axis=1)
    if cls_token:
        pos_embed = np.concatenate([np.zeros([1, embed_dim]), pos_embed], axis=0)
    return pos_embed.astype(np.float32)


def resize_vision_pos_embed(
    pos_embed: jnp.ndarray,  # (old_len [+1 cls], D)
    new_grid: tuple,
    old_grid: tuple,
    num_prefix: int = 1,
    method: str = "bicubic",
    antialias: bool = True,
) -> jnp.ndarray:
    """Bicubic-resize the spatial part of a learned pos-embed table to a new grid
    (reference model.py:790-822 resize_pos_embed)."""
    if old_grid == tuple(new_grid):
        return pos_embed
    prefix, spatial = pos_embed[:num_prefix], pos_embed[num_prefix:]
    d = spatial.shape[-1]
    spatial = spatial.reshape(old_grid[0], old_grid[1], d)
    spatial = jax.image.resize(
        spatial.astype(jnp.float32), (new_grid[0], new_grid[1], d), method=method, antialias=antialias
    )
    spatial = spatial.reshape(new_grid[0] * new_grid[1], d).astype(pos_embed.dtype)
    return jnp.concatenate([prefix, spatial], axis=0)


def resize_text_pos_embed(pos_embed: jnp.ndarray, new_len: int, method: str = "linear") -> jnp.ndarray:
    """Linear-interpolate a text pos-embed table to a new context length
    (reference model.py:824-855)."""
    old_len, d = pos_embed.shape
    if old_len == new_len:
        return pos_embed
    out = jax.image.resize(pos_embed.astype(jnp.float32), (new_len, d), method=method, antialias=False)
    return out.astype(pos_embed.dtype)
