"""Build the native C++ oracle shared library.

Usage: ``python -m nbody_tpu.oracle.build``
Produces ``_nbody_oracle.so`` next to this file. The loader
(:mod:`nbody_tpu.oracle.native`) falls back to the NumPy oracle when the
library is absent or the toolchain is unavailable.
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

HERE = pathlib.Path(__file__).resolve().parent
SRC = HERE / "nbody_oracle.cpp"
LIB = HERE / "_nbody_oracle.so"
CLI_SRC = HERE / "nbody_cli.cpp"
CLI = HERE / "_nbody_cli"

# warnings-as-errors mirrors the reference's dev-mode discipline
# (/root/reference/CMakePresets.json:58, .clang-tidy:25 WarningsAsErrors)
_WARN = ["-Wall", "-Wextra", "-Werror"]
_FLAGS = ["-O3", "-march=native", "-fopenmp", "-std=c++17", *_WARN]
# ASan+UBSan build, the reference's sanitize-ci preset analogue
# (/root/reference/CMakePresets.json:227-237, ci.yml:36-78); exercised by
# `python -m nbody_tpu.oracle.build --sanitize` in CI
_SAN = ["-O1", "-g", "-fno-omit-frame-pointer",
        "-fsanitize=address,undefined", "-fno-sanitize-recover=all"]


IO_SRC = HERE / "nbody_io.cpp"


def _flags(sanitize: bool) -> list[str]:
    if sanitize:
        return ["-march=native", "-fopenmp", "-std=c++17", *_WARN, *_SAN]
    return _FLAGS


def build(verbose: bool = True, *, sanitize: bool = False) -> pathlib.Path:
    out = HERE / "_nbody_oracle_asan.so" if sanitize else LIB
    cmd = ["g++", *_flags(sanitize), "-shared", "-fPIC",
           str(SRC), str(IO_SRC), "-o", str(out)]
    if verbose:
        print("+", " ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


def build_cli(verbose: bool = True, *, sanitize: bool = False) -> pathlib.Path:
    out = HERE / "_nbody_cli_asan" if sanitize else CLI
    cmd = ["g++", *_flags(sanitize), str(CLI_SRC), str(SRC), "-o", str(out)]
    if verbose:
        print("+", " ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    sanitize = "--sanitize" in sys.argv
    try:
        lib = build(sanitize=sanitize)
        print(f"built {lib}")
        cli = build_cli(sanitize=sanitize)
        print(f"built {cli}")
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"native oracle build failed ({e}); NumPy oracle will be used", file=sys.stderr)
        sys.exit(1)
