"""Data pipeline: artifact readers (talk.json / label h5 / feature dirs /
NMT corpora), batched caption+NMT loaders with iterator-resume, prefetch."""

from .dataloader import CaptionDataLoader
from .nmt_dataset import NMTDataset
