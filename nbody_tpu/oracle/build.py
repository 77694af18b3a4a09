"""Build the native C++ oracle shared library.

Usage: ``python -m nbody_tpu.oracle.build``
Produces ``_nbody_oracle.so`` next to this file. The loader
(:mod:`nbody_tpu.oracle.native`) falls back to the NumPy oracle when the
library is absent or the toolchain is unavailable.
"""

from __future__ import annotations

import os
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


def _build_atomic(cmd_prefix: list[str], out: pathlib.Path,
                  verbose: bool) -> pathlib.Path:
    # Compile to a temp name, then rename into place: a process that has
    # the OLD .so mapped (or the old CLI executing) keeps its still-live
    # old inode — an in-place `-o out` would truncate that inode under the
    # mapping (SIGBUS risk) or hit ETXTBSY on the running binary.
    tmp = out.with_name(out.name + f".tmp{os.getpid()}")
    cmd = [*cmd_prefix, "-o", str(tmp)]
    if verbose:
        print("+", " ".join(cmd))
    try:
        subprocess.run(cmd, check=True)
        os.replace(tmp, out)
    finally:
        tmp.unlink(missing_ok=True)
    return out


def build(verbose: bool = True, *, sanitize: bool = False) -> pathlib.Path:
    out = HERE / "_nbody_oracle_asan.so" if sanitize else LIB
    return _build_atomic(
        ["g++", *_flags(sanitize), "-shared", "-fPIC", str(SRC),
         str(IO_SRC)], out, verbose)


def build_cli(verbose: bool = True, *, sanitize: bool = False) -> pathlib.Path:
    out = HERE / "_nbody_cli_asan" if sanitize else CLI
    return _build_atomic(
        ["g++", *_flags(sanitize), str(CLI_SRC), str(SRC)], out, verbose)


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
