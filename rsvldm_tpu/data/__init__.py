from .datasets import SingleImageDataset, LRHRDataset, augment
from .prefetch import make_loader, prefetch_to_device, worker_map
from .prepare import prepare_triplets
