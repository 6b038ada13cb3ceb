from .datasets import DataInfo, get_data
from .wds import expand_urls, iterate_tar_samples, WdsPipeline

__all__ = ["DataInfo", "get_data", "expand_urls", "iterate_tar_samples", "WdsPipeline"]
