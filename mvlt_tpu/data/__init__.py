from mvlt_tpu.data.loader import DataLoader
from mvlt_tpu.data import datasets, transforms

__all__ = ["DataLoader", "datasets", "transforms"]
