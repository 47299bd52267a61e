"""Build system: compiles the native host runtime into the package.

Mirrors the reference's custom ``build_ext`` (``/root/reference/setup.py:20-236``):
per-OS compile of the C++ sources into a shared library shipped inside the
package, with OpenMP support probed by compiling a test program
(``setup.py:180-226``) and graceful degradation to a single-threaded build.
Unlike the reference, a missing compiler is not fatal -- every native entry
point has a pure-numpy fallback (``sparse_matrix_mult_tpu/utils/native.py``),
so the wheel still works; the native library only accelerates host-side
structure analysis and stitching.
"""

import os
import platform
import subprocess
import sys
import tempfile

from setuptools import setup
from setuptools.command.build_py import build_py

ROOT = os.path.dirname(os.path.abspath(__file__))
PKG_LIB = os.path.join(ROOT, "sparse_matrix_mult_tpu", "lib")
SOURCES = [os.path.join(ROOT, "native", "csr_host.cpp")]


def _arch() -> str:
    m = platform.machine().lower()
    return "arm64" if m in ("arm64", "aarch64") else "x86_64"


def _lib_ext() -> str:
    return {"Darwin": "dylib", "Windows": "dll"}.get(platform.system(), "so")


def _compiler() -> str:
    return os.environ.get("CXX") or ("clang++" if platform.system() == "Darwin" else "g++")


def _openmp_flags(cxx: str):
    """Probe OpenMP by compiling a test program (reference setup.py:180-226)."""
    test = "#include <omp.h>\nint main(){return omp_get_max_threads()>0?0:1;}\n"
    candidates = [["-fopenmp"]]
    if platform.system() == "Darwin":
        candidates.append(["-Xpreprocessor", "-fopenmp", "-lomp"])
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "omp_test.cpp")
        with open(src, "w") as f:
            f.write(test)
        for flags in candidates:
            try:
                r = subprocess.run(
                    [cxx, src, "-o", os.path.join(td, "omp_test"), *flags],
                    capture_output=True,
                    timeout=60,
                )
                if r.returncode == 0:
                    return flags
            except (OSError, subprocess.TimeoutExpired):
                return None
    return []


class BuildNativeLib(build_py):
    """Compile native/csr_host.cpp into sparse_matrix_mult_tpu/lib/."""

    def run(self):
        self._build_native()
        super().run()

    def _build_native(self):
        cxx = _compiler()
        out = os.path.join(PKG_LIB, f"libsmmhost_{_arch()}.{_lib_ext()}")
        os.makedirs(PKG_LIB, exist_ok=True)
        omp = _openmp_flags(cxx)
        if omp is None:
            print(
                f"warning: no working C++ compiler ({cxx}); shipping without "
                "the native host library (numpy fallbacks will be used)",
                file=sys.stderr,
            )
            return
        if not omp:
            print("warning: OpenMP unavailable; building single-threaded", file=sys.stderr)
        flags = ["-O3", "-Wall", "-fPIC", "-std=c++17", "-DNDEBUG", "-shared", *omp]
        if platform.system() == "Darwin":
            flags += ["-undefined", "dynamic_lookup"]
        cmd = [cxx, *flags, "-o", out, *SOURCES]
        print(" ".join(cmd))
        r = subprocess.run(cmd, capture_output=True, text=True)
        if r.returncode != 0:
            print(
                f"warning: native build failed, continuing without it:\n{r.stderr}",
                file=sys.stderr,
            )


setup(
    cmdclass={"build_py": BuildNativeLib},
    package_data={"sparse_matrix_mult_tpu": ["lib/libsmmhost*"]},
)
