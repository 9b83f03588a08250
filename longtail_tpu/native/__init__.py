"""Native host-side helpers (C, built on demand with the system compiler).

The TPU data plane is JAX/Pallas; these cover the host runtime paths the
reference implements in C (block codecs, soon: chunk scatter/IO helpers).
Build products are cached next to the sources; a pure-Python fallback exists
for every native entry point, so the package works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(__file__)
_LOCK = threading.Lock()
_LIBS: dict[str, ctypes.CDLL | None] = {}


def _build(name: str, sources: list[str]) -> str | None:
    so_path = os.path.join(_DIR, f"lib{name}.so")
    src_paths = [os.path.join(_DIR, s) for s in sources]
    try:
        newest_src = max(os.path.getmtime(p) for p in src_paths)
        if os.path.exists(so_path) and os.path.getmtime(so_path) >= newest_src:
            return so_path
        cc = os.environ.get("CC", "cc")
        cmd = [cc, "-O3", "-march=native", "-fPIC", "-shared",
               "-o", so_path] + src_paths
        subprocess.run(cmd, check=True, capture_output=True)
        return so_path
    except (OSError, subprocess.CalledProcessError):
        return None


def load(name: str, sources: list[str]) -> ctypes.CDLL | None:
    if os.environ.get("LONGTAIL_TPU_NO_NATIVE"):
        # force the pure-Python fallbacks (CI exercises them explicitly;
        # a cached .so would otherwise mask a missing compiler)
        return None
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        so = _build(name, sources)
        lib = None
        if so is not None:
            try:
                lib = ctypes.CDLL(so)
            except OSError:
                lib = None
        _LIBS[name] = lib
        return lib
