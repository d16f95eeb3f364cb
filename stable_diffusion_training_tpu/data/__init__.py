"""Data layer: aspect-ratio bucketing, streamer-protocol loaders.

Capability parity with the reference's ``streamer`` submodule (API
reconstructed from call sites, SURVEY.md §2.9): chunked dataset fetch,
aspect-ratio bucket assignment, caption shuffle/drop, Nx77 tokenization,
threaded decode workers filling a queue, and the
``grab_next_batch`` / ``None`` / ``"end_of_batch"`` protocol.
"""

from .buckets import calculate_resolution_array, all_bucket_resolutions
from .memory import InMemoryDataLoader
from .dataloader import DataLoader
from .latent_cache import CachedLatentLoader, precompute_latent_cache

__all__ = [
    "calculate_resolution_array",
    "all_bucket_resolutions",
    "InMemoryDataLoader",
    "DataLoader",
    "CachedLatentLoader",
    "precompute_latent_cache",
]
