"""Remote sync + checkpoint IO helpers (reference ``src/open_clip_train/file_utils.py``)."""

import logging
import multiprocessing
import os
import subprocess
import time

logger = logging.getLogger(__name__)


def remote_sync_s3(local_dir: str, remote_dir: str) -> bool:
    result = subprocess.run(
        ["aws", "s3", "sync", local_dir, remote_dir, "--exclude", "*epoch_latest*"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE,
    )
    if result.returncode != 0:
        logger.error("error syncing %s: %s", remote_dir, result.stderr.decode()[:500])
        return False
    return True


def remote_sync_fsspec(local_dir: str, remote_dir: str) -> bool:
    import fsspec

    try:
        fs, remote_root = fsspec.core.url_to_fs(remote_dir)
        for root, _, files in os.walk(local_dir):
            for f in files:
                if "epoch_latest" in f:
                    continue
                src = os.path.join(root, f)
                rel = os.path.relpath(src, local_dir)
                fs.put(src, os.path.join(remote_root, rel))
        return True
    except Exception as e:  # noqa: BLE001
        logger.error("fsspec sync failed: %r", e)
        return False


def remote_sync(local_dir: str, remote_dir: str, protocol: str = "fsspec") -> bool:
    logger.info("starting remote sync to %s", remote_dir)
    if protocol == "s3":
        return remote_sync_s3(local_dir, remote_dir)
    return remote_sync_fsspec(local_dir, remote_dir)


def keep_running_remote_sync(sync_every: int, local_dir: str, remote_dir: str, protocol: str):
    while True:
        time.sleep(sync_every)
        remote_sync(local_dir, remote_dir, protocol)


def start_sync_process(sync_every: int, local_dir: str, remote_dir: str, protocol: str = "fsspec"):
    return multiprocessing.Process(
        target=keep_running_remote_sync, args=(sync_every, local_dir, remote_dir, protocol), daemon=True
    )


def pt_load(file_path: str, map_location="cpu"):
    """Load a (possibly remote) torch checkpoint via fsspec (reference file_utils.py:71-83)."""
    import fsspec
    import torch

    if not file_path.startswith("/"):
        logger.info("loading remote checkpoint %s; this may take a while", file_path)
    with fsspec.open(file_path, "rb") as fh:
        return torch.load(fh, map_location=map_location, weights_only=True)
