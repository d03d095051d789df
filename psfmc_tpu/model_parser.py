"""Model-definition DSL: parse a restricted-Python model file.

Same user contract as the reference (reference model_parser.py:9-66): a
model file is a Python script whose bare component-constructor
expressions (``Sky(...)``, ``Sersic(...)``) each declare one model
component.  Implementation: the file's AST is rewritten so every
top-level bare expression appends its value to a hidden accumulator
list, component/distribution names are injected into the namespace, the
file executes with its own directory as CWD (so image paths are
file-relative), and all ``ComponentBase`` instances are collected.

Compatibility: model files written for the original psfMC (importing
``psfMC.ModelComponents`` / ``psfMC.distributions``) run unmodified —
:mod:`psfmc_tpu.compat` installs import shims for those module names.
"""
from __future__ import annotations

import ast
import contextlib
import os

from .compat import install_reference_shims
from .models.components import ComponentBase

__all__ = ["component_list_from_file", "component_list_from_string"]

_ACC_NAME = "__psfmc_components__"


class _CollectBareExprs(ast.NodeTransformer):
    """Rewrite module-level bare expressions into accumulator appends.

    ``Sersic(...)`` becomes ``__psfmc_components__.append(Sersic(...))``
    (the reference uses ``+= [...]``; append is equivalent and keeps the
    accumulator a plain list).

    Assignments are deliberately NOT collected: auto-appending
    ``host = Sersic(...)`` would silently change component membership
    and ordering for existing model files (the parameter-vector layout
    convention forbids silent changes).  To name a component — e.g. so
    a tie can reference it, ``PointSource(xy=Tied(host, 'xy'))`` —
    assign it AND mention it as a bare expression where it belongs::

        host = Sersic(...)
        host                        # <- adds it, at this position
        PointSource(xy=Tied(host, 'xy'), mag=...)

    The collected list is de-duplicated by identity (mentioning a name
    twice is safe), and components that were assigned but never
    mentioned trigger a loud warning after exec.
    """

    @staticmethod
    def _append_of(value_node):
        return ast.Expr(
            value=ast.Call(
                func=ast.Attribute(
                    value=ast.Name(id=_ACC_NAME, ctx=ast.Load()),
                    attr="append",
                    ctx=ast.Load(),
                ),
                args=[value_node],
                keywords=[],
            )
        )

    def visit_Expr(self, node):
        return ast.copy_location(self._append_of(node.value), node)


@contextlib.contextmanager
def _working_dir(path):
    prev = os.getcwd()
    if path:
        os.chdir(path)
    try:
        yield
    finally:
        os.chdir(prev)


def _injected_imports():
    """Star-import components and distributions, user code may override."""
    mods = [
        ("psfmc_tpu.models.components", "*"),
        ("psfmc_tpu.distributions", "*"),
    ]
    nodes = []
    for module, name in mods:
        nodes.append(
            ast.ImportFrom(
                module=module,
                names=[ast.alias(name=name, asname=None)],
                level=0,
            )
        )
    return nodes


def component_list_from_string(source, filename="<model>", model_dir=""):
    """Parse model source text; returns list of ComponentBase instances."""
    install_reference_shims()

    tree = ast.parse(source)
    header = _injected_imports()
    # Initialize the accumulator list
    header.append(
        ast.Assign(
            targets=[ast.Name(id=_ACC_NAME, ctx=ast.Store())],
            value=ast.List(elts=[], ctx=ast.Load()),
        )
    )
    tree.body = header + [
        _CollectBareExprs().visit(node) for node in tree.body
    ]
    ast.fix_missing_locations(tree)

    namespace = {}
    code = compile(tree, filename, mode="exec")
    with _working_dir(model_dir):
        exec(code, namespace)

    out, seen = [], set()
    for comp in namespace[_ACC_NAME]:
        if isinstance(comp, ComponentBase) and id(comp) not in seen:
            seen.add(id(comp))
            out.append(comp)

    # a component assigned to a name but never mentioned as a bare
    # expression is NOT part of the model (reference semantics) — warn
    # loudly, since silently dropping it is a classic footgun
    orphans = [
        name
        for name, val in namespace.items()
        if isinstance(val, ComponentBase) and id(val) not in seen
    ]
    if orphans:
        import warnings

        warnings.warn(
            f"model file assigns component(s) {orphans} that are never "
            "mentioned as bare expressions — they are NOT included in "
            "the model.  Add the bare name on its own line where the "
            "component belongs."
        )
    return out


def component_list_from_file(filename):
    """Read a model file and return its component list."""
    with open(filename) as f:
        source = f.read()
    return component_list_from_string(
        source, filename=filename, model_dir=os.path.dirname(filename)
    )
