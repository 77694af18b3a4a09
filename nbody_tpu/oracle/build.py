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

_FLAGS = ["-O3", "-march=native", "-fopenmp", "-std=c++17"]


IO_SRC = HERE / "nbody_io.cpp"


def build(verbose: bool = True) -> pathlib.Path:
    cmd = ["g++", *_FLAGS, "-shared", "-fPIC", str(SRC), str(IO_SRC), "-o", str(LIB)]
    if verbose:
        print("+", " ".join(cmd))
    subprocess.run(cmd, check=True)
    return LIB


def build_cli(verbose: bool = True) -> pathlib.Path:
    cmd = ["g++", *_FLAGS, str(CLI_SRC), str(SRC), "-o", str(CLI)]
    if verbose:
        print("+", " ".join(cmd))
    subprocess.run(cmd, check=True)
    return CLI


if __name__ == "__main__":
    try:
        build()
        print(f"built {LIB}")
        build_cli()
        print(f"built {CLI}")
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"native oracle build failed ({e}); NumPy oracle will be used", file=sys.stderr)
        sys.exit(1)
