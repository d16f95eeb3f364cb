"""JSON config/state IO.

The run config JSON doubles as a mutable resume-state store (the orchestration
loop rewrites ``model_path``/``chunk_number``/``chunk_steps``/``master_seed``
after every chunk), matching the reference semantics at
``/root/reference/training.py:301-315``.
"""

import json
import os
import shutil


def read_json_file(path: str) -> dict:
    """Read a JSON file into a dict."""
    with open(path, "r") as f:
        return json.load(f)


def save_dict_to_json(data: dict, path: str) -> None:
    """Atomically write a dict as JSON (write temp file then rename).

    Atomicity matters because the file is the crash-resume state store:
    a partially written state file would brick the run.
    """
    tmp = f"{path}.tmp"
    with open(tmp, "w") as f:
        json.dump(data, f, indent=4)
    os.replace(tmp, path)


def delete_file_or_folder(path: str) -> None:
    """Delete a file or directory tree; silently ignore missing paths.

    Used for checkpoint rotation and ramdisk chunk cleanup
    (reference ``training.py:183-184, 276-278, 297-299``).
    """
    if os.path.isdir(path):
        shutil.rmtree(path, ignore_errors=True)
    elif os.path.exists(path):
        try:
            os.remove(path)
        except OSError:
            pass
