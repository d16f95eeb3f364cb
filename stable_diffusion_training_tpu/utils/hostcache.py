"""Host fingerprint for persistent XLA:CPU compile caches.

XLA:CPU executables are AOT-compiled for the compiling machine's CPU
features; deserializing an entry produced on a different box (CI hosts
rotate) warns about mismatched machine features and can SIGILL/SEGV.
Keying cache directories by this fingerprint keeps every entry loadable
where it is read. Shared by ``tests/conftest.py`` and
``__graft_entry__``'s multichip dryrun.

The fingerprint must cover MORE than /proc/cpuinfo feature flags: XLA's
``cpu_aot_loader`` compares against a compile-embedded feature string that
includes model-derived LLVM *tuning preferences* (e.g. ``+prefer-no-gather``
on Zen5/Granite-Rapids parts) which never appear in cpuinfo flags — two
boxes with identical flag sets but different model names produced the
round-3 "could lead to execution errors such as SIGILL" warnings. So the
hash also folds in the CPU model name and the jaxlib version (whose XLA
revision decides which tuning prefs get embedded).
"""

import hashlib
import os
import platform
import shutil


def host_cache_fingerprint() -> str:
    """Short stable hash of the host CPU identity as XLA:CPU sees it:
    feature flags + model name (tuning-pref proxy) + jaxlib version."""
    feats = None
    model = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                # x86 exposes "flags"; ARM exposes "Features"
                if feats is None and line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                elif not model and line.startswith("model name"):
                    model = line.split(":", 1)[1].strip()
                if feats is not None and model:
                    break
    except OSError:
        pass
    if not feats:
        # last resort: coarse but never empty (machine arch + processor)
        feats = f"{platform.machine()}|{platform.processor()}|generic"
    try:
        import jaxlib

        jl = getattr(jaxlib, "__version__", "unknown")
    except Exception:
        jl = "unknown"
    return hashlib.sha256(f"{feats}|{model}|jaxlib={jl}".encode()).hexdigest()[
        :12
    ]


def prepare_cache_dir(base_dir: str, prefix: str) -> str:
    """Create (and return) ``{base_dir}/{prefix}_{fingerprint}`` and purge
    every stale sibling ``{prefix}*`` directory with a different key —
    including the legacy unfingerprinted ``{prefix}`` dir. Stale entries
    are not merely dead weight: a fingerprint-formula change (or an old
    unkeyed dir) leaves AOT executables that the loader will happily
    deserialize with SIGILL-risk feature mismatches if they ever become
    reachable again."""
    name = f"{prefix}_{host_cache_fingerprint()}"
    try:
        for entry in os.listdir(base_dir):
            if entry != name and (
                entry == prefix or entry.startswith(prefix + "_")
            ):
                shutil.rmtree(os.path.join(base_dir, entry),
                              ignore_errors=True)
    except OSError:
        pass
    path = os.path.join(base_dir, name)
    os.makedirs(path, exist_ok=True)
    return path
