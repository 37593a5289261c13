"""Guard against the round-3 silent-failure class: a relative import inside
a function body of a WORKER-SHIPPED module (functions/selfship.py modules)
executes on the executor, where the package is not importable — it dies
with ModuleNotFoundError, and error-isolating operators then turn every
affected row into an error row SILENTLY (exactly how png_image_decoder's
body-level ``from .png import png_features`` corrupted mm_features in the
driver's session until the oracle caught it).

Rule enforced here: modules that call self_ship(__name__) must hoist all
intra-package imports to module level so closures capture them by value.
Driver-side-only builders in those modules can be allowlisted explicitly.
"""

from __future__ import annotations

import ast
import os

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "prefect_flow_arc_alto_to_json_spark",
)

#: (relpath, function) pairs known to run ONLY on the driver (plan
#: builders), where a lazy import is allowed even in a shipped module.
ALLOWLIST: set[tuple[str, str]] = {
    ("streaming/pipeline.py", "stream_alto_documents"),
}


def _shipped_modules() -> list[str]:
    out = []
    for root, _, files in os.walk(PKG):
        for f in files:
            if not f.endswith(".py"):
                continue
            p = os.path.join(root, f)
            src = open(p).read()
            if "self_ship(__name__)" in src and not p.endswith("selfship.py"):
                out.append(p)
    return sorted(out)


def test_no_body_level_relative_imports_in_shipped_modules():
    mods = _shipped_modules()
    assert len(mods) >= 8  # the worker-code surface exists
    offenders = []
    for p in mods:
        rel = os.path.relpath(p, PKG)
        tree = ast.parse(open(p).read())
        for node in ast.walk(tree):
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                for sub in ast.walk(node):
                    if (
                        isinstance(sub, ast.ImportFrom)
                        and sub.level > 0
                        and (rel, node.name) not in ALLOWLIST
                    ):
                        offenders.append(f"{rel}:{sub.lineno} in {node.name}()")
    assert not offenders, (
        "body-level relative imports in worker-shipped modules (would raise "
        f"ModuleNotFoundError on executors): {offenders}"
    )


def test_no_package_module_aliases_in_shipped_function_bodies():
    """Gotcha #3: a worker closure that references a MODULE OBJECT
    (``from . import wav as wav_mod`` then ``wav_mod.decode_wav(...)``
    inside the kernel) pickles the module BY NAME — even under
    register_pickle_by_value — and dies with ModuleNotFoundError on
    executors. Module aliases may only appear at module level / in
    def-time-evaluated default args, never inside a function BODY of a
    shipped module."""
    offenders = []
    for p in _shipped_modules():
        rel = os.path.relpath(p, PKG)
        tree = ast.parse(open(p).read())
        aliases = {
            (a.asname or a.name)
            for node in ast.walk(tree)
            if isinstance(node, ast.ImportFrom) and node.level > 0
            for a in node.names
            if os.path.exists(
                os.path.join(os.path.dirname(p), f"{a.name}.py")
            )  # the imported name is a sibling MODULE, not a function
        }
        if not aliases:
            continue
        for node in ast.walk(tree):
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                for sub in ast.walk(ast.Module(body=node.body, type_ignores=[])):
                    if isinstance(sub, ast.Name) and sub.id in aliases:
                        offenders.append(f"{rel}:{sub.lineno} {sub.id} in {node.name}()")
    assert not offenders, (
        "package-module aliases referenced inside shipped function bodies "
        f"(pickle by name -> ModuleNotFoundError on executors): {offenders}"
    )
