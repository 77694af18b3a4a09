"""Generate docs/API_GENERATED.md from the package's live docstrings.

The reference ships a Doxygen/Sphinx pipeline
(/root/reference/docs/Doxyfile.in, conf.py.in); this is the equivalent for
a zero-egress environment with no doc toolchain baked in: a deterministic
walker over the public API (module docstring, public classes with their
public methods, public functions) emitting one Markdown file. Run via

    python scripts/gen_api_docs.py          # writes docs/API_GENERATED.md
    python scripts/gen_api_docs.py --check  # CI mode: fail if stale

CI regenerates and diffs, so the committed file can never drift from the
code (the Doxygen-in-CI analogue).
"""

from __future__ import annotations

import importlib
import inspect
import pathlib
import sys
import textwrap

REPO = pathlib.Path(__file__).resolve().parent.parent
OUT = REPO / "docs" / "API_GENERATED.md"

# public surface, in reading order
MODULES = [
    "nbody_tpu",
    "nbody_tpu.params",
    "nbody_tpu.config",
    "nbody_tpu.ic",
    "nbody_tpu.models.body_system",
    "nbody_tpu.models.ds_system",
    "nbody_tpu.compute",
    "nbody_tpu.ops.reference",
    "nbody_tpu.ops.pallas_kernel",
    "nbody_tpu.ops.symmetric_kernel",
    "nbody_tpu.ops.ds_kernel",
    "nbody_tpu.ops.adaptive",
    "nbody_tpu.ops.pm",
    "nbody_tpu.ops.p3m",
    "nbody_tpu.ops.p3m_kernel",
    "nbody_tpu.ops.ring_kernel",
    "nbody_tpu.ops.energy",
    "nbody_tpu.ops.diff",
    "nbody_tpu.parallel.mesh",
    "nbody_tpu.parallel.sharded",
    "nbody_tpu.parallel.multihost",
    "nbody_tpu.io.tipsy",
    "nbody_tpu.io.checkpoint",
    "nbody_tpu.io.apng",
    "nbody_tpu.io.avi",
    "nbody_tpu.io.png",
    "nbody_tpu.render.camera",
    "nbody_tpu.render.rasterizer",
    "nbody_tpu.ui.controls",
    "nbody_tpu.ui.hud",
    "nbody_tpu.ui.params_panel",
    "nbody_tpu.oracle",
    "nbody_tpu.oracle.native",
    "nbody_tpu.oracle.numpy_oracle",
    "nbody_tpu.utils.timing",
    "nbody_tpu.utils.profiling",
    "nbody_tpu.utils.compilation_cache",
    "nbody_tpu.cli",
]


def _sig(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _doc(obj, indent: str = "") -> str:
    doc = inspect.getdoc(obj)
    if not doc:
        return ""
    return textwrap.indent(doc, indent)


def _is_local(obj, modname: str) -> bool:
    return getattr(obj, "__module__", None) == modname


def render_module(modname: str) -> list[str]:
    mod = importlib.import_module(modname)
    lines = [f"## `{modname}`", ""]
    head = (inspect.getdoc(mod) or "").strip()
    if head:
        # first paragraph only — the full prose lives in the source
        lines += [head.split("\n\n")[0], ""]

    names = getattr(mod, "__all__", None)
    if names is None:
        names = [n for n in sorted(vars(mod)) if not n.startswith("_")]
    for name in names:
        obj = getattr(mod, name, None)
        if obj is None or inspect.ismodule(obj):
            continue
        if inspect.isclass(obj):
            if not _is_local(obj, modname):
                continue
            lines += [f"### class `{name}{_sig(obj)}`", ""]
            d = _doc(obj)
            if d:
                lines += [d, ""]
            for mname, meth in sorted(vars(obj).items()):
                if mname.startswith("_") or not callable(meth):
                    continue
                lines += [f"- **`{mname}{_sig(meth)}`**"]
                md = inspect.getdoc(meth)
                if md:
                    first = md.strip().split("\n\n")[0].replace("\n", " ")
                    lines += [textwrap.indent(first, "  ")]
            lines += [""]
        elif callable(obj):
            target = inspect.unwrap(obj)
            owner = getattr(target, "__module__", modname)
            if owner != modname and modname != "nbody_tpu":
                continue
            lines += [f"### `{name}{_sig(target)}`", ""]
            d = _doc(obj) or _doc(target)
            if d:
                lines += [d, ""]
    return lines


def generate() -> str:
    lines = [
        "# nbody_tpu — generated API reference",
        "",
        "Generated from live docstrings by `scripts/gen_api_docs.py`; do "
        "not edit by hand (CI checks it is current). The curated guide "
        "with examples is `docs/API.md`.",
        "",
    ]
    for m in MODULES:
        lines += render_module(m)
    return "\n".join(lines).rstrip() + "\n"


def main() -> int:
    text = generate()
    if "--check" in sys.argv:
        current = OUT.read_text() if OUT.exists() else ""
        if current != text:
            print(f"{OUT} is stale — run python scripts/gen_api_docs.py",
                  file=sys.stderr)
            return 1
        print(f"{OUT} is current")
        return 0
    OUT.write_text(text)
    print(f"wrote {OUT} ({len(text.splitlines())} lines)")
    return 0


if __name__ == "__main__":
    sys.path.insert(0, str(REPO))
    raise SystemExit(main())
