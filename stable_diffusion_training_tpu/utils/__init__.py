"""Host-side utilities: JSON state IO, timing, filesystem helpers.

Provides the same surface the reference imports from ``streamer.utils``
(reference ``training.py:14-19``, ``training_utils.py:22``).
"""

from .json_io import read_json_file, save_dict_to_json, delete_file_or_folder
from .timing import TimingContextManager
from .profiling import StepTimer, profiler_trace

__all__ = [
    "read_json_file",
    "save_dict_to_json",
    "delete_file_or_folder",
    "TimingContextManager",
    "StepTimer",
    "profiler_trace",
]
