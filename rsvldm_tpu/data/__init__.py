from .datasets import SingleImageDataset, LRHRDataset, augment
from .prepare import prepare_triplets
