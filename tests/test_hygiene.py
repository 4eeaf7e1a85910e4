"""Source-hygiene guards.

Round-4 postmortem: a redundant ``from tpuzip.runtime.errors import
CorruptStreamError`` inside a rarely-taken branch of
``runner._decode_corpus_blocks`` made the name function-local for the
WHOLE function, so the per-block-checksum mismatch path (which runs when
that branch does not) died with ``UnboundLocalError`` instead of raising
the taxonomy error.  These tests scan the package AST so the class of
bug cannot come back silently.
"""
import ast
import pathlib

PKG = pathlib.Path(__file__).resolve().parent.parent / "tpuzip"


def _module_level_names(tree: ast.Module):
    names = set()
    for n in tree.body:
        if isinstance(n, ast.ImportFrom):
            names.update(a.asname or a.name for a in n.names)
        elif isinstance(n, ast.Import):
            names.update((a.asname or a.name).split(".")[0] for a in n.names)
    return names


def _iter_functions(tree):
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            yield node


def test_no_local_import_shadows_module_import():
    """A local ``import X``/``from m import X`` inside a function whose
    module already imports ``X`` at top level makes every use of ``X`` in
    that function resolve to the (possibly never-assigned) local — flag
    them all; the redundant import is never needed."""
    offenders = []
    for path in sorted(PKG.rglob("*.py")):
        tree = ast.parse(path.read_text())
        mod_names = _module_level_names(tree)
        for fn in _iter_functions(tree):
            for node in ast.walk(fn):
                if isinstance(node, (ast.Import, ast.ImportFrom)):
                    for a in node.names:
                        nm = (a.asname or a.name).split(".")[0]
                        if nm in mod_names:
                            offenders.append(
                                f"{path.relative_to(PKG.parent)}:"
                                f"{node.lineno} local import of '{nm}' "
                                f"shadows the module-level import in "
                                f"{fn.name}()")
    assert not offenders, "\n".join(offenders)


def test_local_import_reads_are_dominated_by_an_import():
    """A name bound only by imports nested under If/Try/loop risks
    UnboundLocalError on the paths that skip the import.  Approximate
    dominance: every read of a locally-imported name must have SOME
    import of that name at an earlier line in the same or an enclosing
    block (mutually-exclusive branches that each import before use pass;
    the round-4 checksum-path bug — read in a sibling branch with no
    import of its own — fails).  try/except blocks are transparent: the
    ``try: import native ... except: flag = False`` idiom is established
    here and always pairs the import with a guard flag."""
    offenders = []
    for path in sorted(PKG.rglob("*.py")):
        tree = ast.parse(path.read_text())
        for fn in _iter_functions(tree):
            imports = {}  # name -> [import nodes]
            for node in ast.walk(fn):
                if isinstance(node, (ast.Import, ast.ImportFrom)):
                    for a in node.names:
                        nm = (a.asname or a.name).split(".")[0]
                        imports.setdefault(nm, []).append(node)
            if not imports:
                continue
            blocks = _block_map(fn)
            for use in ast.walk(fn):
                if not (isinstance(use, ast.Name)
                        and isinstance(use.ctx, ast.Load)
                        and use.id in imports):
                    continue
                use_chain = blocks[id(use)]
                ok = any(
                    imp.lineno <= use.lineno
                    and _is_prefix(blocks[id(imp)], use_chain)
                    for imp in imports[use.id])
                if not ok:
                    offenders.append(
                        f"{path.relative_to(PKG.parent)}:{use.lineno} "
                        f"reads '{use.id}' on a path that may skip every "
                        f"local import of it ({fn.name}())")
    assert not offenders, "\n".join(offenders)


def _block_map(fn):
    """id(node) -> tuple of enclosing compound-statement ids (the block
    chain), computed by a recursive descent from ``fn``."""
    out = {}

    def visit(node, chain):
        out[id(node)] = chain
        compound = (isinstance(node, (ast.If, ast.For, ast.While,
                                      ast.With, ast.FunctionDef,
                                      ast.AsyncFunctionDef))
                    and node is not fn)
        # Each statement-list FIELD gets its own chain element so an If's
        # body and orelse are distinct blocks: an import in one arm does
        # not dominate a read in the sibling arm (round-4 advisor fix —
        # the old per-NODE chain merged the arms, a false negative).
        for field, value in ast.iter_fields(node):
            sub = chain + ((id(node), field),) if compound else chain
            if isinstance(value, ast.AST):
                visit(value, sub)
            elif isinstance(value, list):
                for item in value:
                    if isinstance(item, ast.AST):
                        visit(item, sub)

    visit(fn, ())
    return out


def _is_prefix(shorter, longer):
    return shorter == longer[: len(shorter)]
