"""Host fingerprint for persistent XLA:CPU compile caches.

XLA:CPU executables are AOT-compiled for the compiling machine's CPU
features; deserializing an entry produced on a different box (CI hosts
rotate) warns about mismatched machine features and can SIGILL/SEGV.
Keying cache directories by this fingerprint keeps every entry loadable
where it is read. Shared by ``tests/conftest.py`` and
``__graft_entry__``'s multichip dryrun."""

import hashlib
import platform


def host_cache_fingerprint() -> str:
    """Short stable hash of the host CPU's feature set."""
    feats = None
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                # x86 exposes "flags"; ARM exposes "Features"
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    if not feats:
        # last resort: coarse but never empty (machine arch + processor)
        feats = f"{platform.machine()}|{platform.processor()}|generic"
    return hashlib.sha256(feats.encode()).hexdigest()[:12]
