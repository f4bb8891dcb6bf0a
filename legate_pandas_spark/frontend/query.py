"""pandas ``DataFrame.query(expr)`` → Spark SQL condition translation.

The reference JIT-compiles query expressions with numba into CPU cfuncs / CUDA PTX
and evaluates them as a row-wise UDF (reference core/query.py:33-311,
src/udf/eval_udf.cc). On Spark that whole machinery is unnecessary: translating the
expression into a Catalyst predicate gets whole-stage-codegen'd JVM execution plus
predicate pushdown — strictly better than a Python-side JIT. Only expressions the
translator cannot express should fall back to a Pandas UDF (not needed for the
reference's supported grammar, which is comparisons/arithmetic/boolean logic only).
"""

from __future__ import annotations

import ast

_BINOP = {
    ast.Add: "+",
    ast.Sub: "-",
    ast.Mult: "*",
    ast.Div: "/",
    ast.Mod: "%",
    ast.Pow: "^",  # rewritten to power() below
    ast.BitAnd: "&",
    ast.BitOr: "|",
    ast.BitXor: "^",
}

_CMPOP = {
    ast.Eq: "=",
    ast.NotEq: "<>",
    ast.Lt: "<",
    ast.LtE: "<=",
    ast.Gt: ">",
    ast.GtE: ">=",
}


class QueryTranslationError(ValueError):
    pass


def _emit(node: ast.AST, env: dict | None) -> str:
    if isinstance(node, ast.BoolOp):
        op = " AND " if isinstance(node.op, ast.And) else " OR "
        return "(" + op.join(_emit(v, env) for v in node.values) + ")"
    if isinstance(node, ast.UnaryOp):
        if isinstance(node.op, ast.Not):
            return f"(NOT {_emit(node.operand, env)})"
        if isinstance(node.op, ast.USub):
            return f"(-{_emit(node.operand, env)})"
        if isinstance(node.op, ast.Invert):
            return f"(NOT {_emit(node.operand, env)})"
        raise QueryTranslationError(f"unsupported unary op: {ast.dump(node)}")
    if isinstance(node, ast.Compare):
        # Each comparison atom compiles TOTAL (never null) so and/or/not are
        # plain two-valued Python logic, exactly like pandas/numexpr on NaN:
        # NaN == x / < / > ... evaluate False, NaN != x and NaN not-in [...]
        # evaluate True. Bare SQL three-valued logic would instead DROP null
        # rows under `not (k == 1)` and `k != 1`, which pandas keeps.
        left = _emit(node.left, env)
        parts = []
        for op, comparator in zip(node.ops, node.comparators):
            right = _emit(comparator, env)
            if isinstance(op, ast.In):
                parts.append(f"coalesce({left} IN ({right.strip('()')}), FALSE)")
            elif isinstance(op, ast.NotIn):
                parts.append(f"coalesce({left} NOT IN ({right.strip('()')}), TRUE)")
            else:
                cls = type(op)
                if cls not in _CMPOP:
                    raise QueryTranslationError(f"unsupported comparison: {cls.__name__}")
                default = "TRUE" if cls is ast.NotEq else "FALSE"
                parts.append(f"coalesce({left} {_CMPOP[cls]} {right}, {default})")
            left = right
        return "(" + " AND ".join(parts) + ")"
    if isinstance(node, ast.BinOp):
        cls = type(node.op)
        if cls is ast.Pow:
            return f"power({_emit(node.left, env)}, {_emit(node.right, env)})"
        if cls is ast.FloorDiv:
            # CPython derives // from the fmod remainder (divmod-consistent),
            # not floor(a/b) — see dtypes.floordiv for the subnormal edge
            a, b = _emit(node.left, env), _emit(node.right, env)
            r = f"try_mod({a}, {b})"
            adj = f"(CASE WHEN {r} <> 0 AND (({r} < 0) <> ({b} < 0)) THEN 1.0 ELSE 0.0 END)"
            dv = f"((({a}) - {r}) / ({b}) - {adj})"
            return (
                f"(CASE WHEN ({b}) = 0 THEN floor(({a}) / ({b})) "
                f"WHEN {dv} - floor({dv}) > 0.5 THEN floor({dv}) + 1 "
                f"ELSE floor({dv}) END)"
            )
        if cls is ast.Mod:
            # Python % is FLOORED modulo (sign of the divisor); Spark's % is
            # truncated (sign of the dividend). Mirror CPython float_rem:
            # r = fmod(a, b); nonzero r with the wrong sign gets b added —
            # WITHOUT re-modding the sum (a subnormal r makes r+b round to b,
            # which CPython keeps; a second mod would zero it). try_mod
            # yields null on a zero divisor (pandas NaN — same filter
            # outcome) instead of the ANSI-mode exception.
            a, b = _emit(node.left, env), _emit(node.right, env)
            r = f"try_mod({a}, {b})"
            return (
                f"(CASE WHEN {r} <> 0 AND (({r} < 0) <> ({b} < 0)) "
                f"THEN {r} + {b} ELSE {r} END)"
            )
        if cls not in _BINOP:
            raise QueryTranslationError(f"unsupported binary op: {cls.__name__}")
        return f"({_emit(node.left, env)} {_BINOP[cls]} {_emit(node.right, env)})"
    if isinstance(node, ast.Name):
        # `@external` variables arrive as plain names prefixed by ast parse of
        # "__at__<name>" (handled in translate_query_expr); bare names are columns.
        if env is not None and node.id.startswith("__at__"):
            return _lit(env[node.id[6:]])
        return f"`{node.id}`"
    if isinstance(node, ast.Constant):
        return _lit(node.value)
    if isinstance(node, (ast.List, ast.Tuple)):
        return "(" + ", ".join(_emit(e, env) for e in node.elts) + ")"
    if isinstance(node, ast.Call):
        # whitelist of scalar fns usable inside query expressions
        if isinstance(node.func, ast.Name) and node.func.id in {"abs", "sqrt", "floor", "ceil"}:
            args = ", ".join(_emit(a, env) for a in node.args)
            return f"{node.func.id}({args})"
        raise QueryTranslationError(f"unsupported call: {ast.dump(node)}")
    raise QueryTranslationError(f"unsupported syntax: {ast.dump(node)}")


def _column_names(node: ast.AST) -> set:
    """All bare column references in a subtree (`__at__` env vars excluded)."""
    out: set = set()
    for n in ast.walk(node):
        if isinstance(n, ast.Name) and not n.id.startswith("__at__"):
            out.add(n.id)
    return out


def _has_const_atom(node: ast.AST) -> bool:
    """True iff some comparison atom references no column at all. pandas
    evaluates such atoms as PYTHON SCALARS under the &/|/~ operator mapping
    (query maps and→&, or→|, not→~), so `not (0 <= 0)` is ~True == -2 (an
    int!), `mask or -2` is elementwise `0|-2` (truthy everywhere) and
    `mask and -2` is `1&-2 == 0` (empty). Plain boolean SQL cannot express
    that — these trees take the numexpr-exact integer compiler below."""
    return any(
        isinstance(n, ast.Compare) and not _column_names(n)
        for n in ast.walk(node)
    )


_CONST_EVAL_NODES = (
    ast.BoolOp, ast.And, ast.Or,
    ast.UnaryOp, ast.Not, ast.Invert, ast.USub, ast.UAdd,
    ast.BinOp, ast.Add, ast.Sub, ast.Mult, ast.Div, ast.Mod, ast.Pow,
    ast.FloorDiv, ast.BitAnd, ast.BitOr, ast.BitXor,
    ast.Compare, ast.Eq, ast.NotEq, ast.Lt, ast.LtE, ast.Gt, ast.GtE,
    ast.In, ast.NotIn,
    ast.Constant, ast.List, ast.Tuple, ast.Load, ast.Name,
)


def _py_const_eval(node: ast.AST, env: dict | None):
    """Evaluate a column-free subtree exactly like pandas' scalar path:
    and→&, or→|, not→~ under native Python semantics (bool & bool stays
    bool; ~bool is an int). The subtree is node-type-whitelisted first —
    name-free call/attribute atoms (e.g. `(1).bit_length()`) are rejected
    like pandas' parser rejects them, never eval'd."""
    import copy

    for n in ast.walk(node):
        if not isinstance(n, _CONST_EVAL_NODES):
            raise QueryTranslationError(
                f"unsupported constant expression node: {type(n).__name__}"
            )
        if isinstance(n, ast.Name) and not n.id.startswith("__at__"):
            raise QueryTranslationError(f"not a constant: {n.id}")

    class _T(ast.NodeTransformer):
        def visit_BoolOp(self, n):
            self.generic_visit(n)
            op = ast.BitAnd() if isinstance(n.op, ast.And) else ast.BitOr()
            cur = n.values[0]
            for v in n.values[1:]:
                cur = ast.BinOp(left=cur, op=op, right=v)
            return cur

        def visit_UnaryOp(self, n):
            self.generic_visit(n)
            if isinstance(n.op, ast.Not):
                return ast.UnaryOp(op=ast.Invert(), operand=n.operand)
            return n

    tree = ast.fix_missing_locations(_T().visit(copy.deepcopy(node)))
    ns = {"__builtins__": {}}
    for k, v in (env or {}).items():
        ns[f"__at__{k}"] = v
    return eval(  # noqa: S307 — node-type-whitelisted AST, no builtins
        compile(ast.Expression(body=tree), "<query-const>", "eval"), ns
    )


def _emit_scalar_logic(node: ast.AST, env: dict | None) -> tuple:
    """Exact compiler for trees holding constant atoms, mirroring pandas'
    PYTHON eval engine (the one in play when numexpr is absent — also this
    environment's): and→&, or→|, not→~, where column-free subtrees evaluate
    as native Python scalars (`~True` is the INT -2) and a bool mask
    combined with an int scalar collapses back to a BOOL mask elementwise —
    `mask & c` keeps the mask iff c is odd (1 & c), empties it otherwise;
    `mask | c` keeps the mask iff c == 0, floods all rows otherwise.
    Returns ('int', python_scalar) or ('bool', sql_mask)."""
    if isinstance(node, ast.BoolOp):
        is_and = isinstance(node.op, ast.And)
        cur = _emit_scalar_logic(node.values[0], env)
        for v in node.values[1:]:
            cur = _combine_scalar_logic(cur, _emit_scalar_logic(v, env), is_and)
        return cur
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, (ast.Not, ast.Invert)):
        # pandas maps `not` to ~, so the two spellings are one operator here
        k, x = _emit_scalar_logic(node.operand, env)
        if k == "int":
            return ("int", ~x)  # Python ~: ~True == -2, ~0 == -1
        return ("bool", f"(NOT {x})")  # pandas ~mask is logical
    if isinstance(node, ast.Compare):
        if not _column_names(node):
            return ("int", _py_const_eval(node, env))
        return ("bool", _emit(node, env))
    # a bare constant / arithmetic scalar in boolean position
    if not _column_names(node):
        return ("int", _py_const_eval(node, env))
    raise QueryTranslationError(
        f"unsupported boolean operand in scalar-logic expression: {ast.dump(node)}"
    )


def _combine_scalar_logic(left: tuple, right: tuple, is_and: bool) -> tuple:
    lk, lv = left
    rk, rv = right
    if lk == "int" and rk == "int":
        # native Python: bool&bool stays bool, anything with an int is int
        return ("int", (lv & rv) if is_and else (lv | rv))
    if lk == "bool" and rk == "bool":
        op = "AND" if is_and else "OR"
        return ("bool", f"({lv} {op} {rv})")
    # bool mask x python scalar — pandas collapses to a bool mask each step
    m = lv if lk == "bool" else rv
    c = lv if lk == "int" else rv
    if isinstance(c, bool):
        if is_and:
            return ("bool", m) if c else ("bool", "FALSE")
        return ("bool", "TRUE") if c else ("bool", m)
    if not isinstance(c, int):
        raise QueryTranslationError(
            f"cannot combine a boolean mask with scalar {c!r}"
        )
    if is_and:
        return ("bool", m) if (1 & c) else ("bool", "FALSE")
    return ("bool", m) if c == 0 else ("bool", "TRUE")


def _finish_scalar_logic(tagged: tuple) -> str:
    k, x = tagged
    if k == "int":
        return "TRUE" if x != 0 else "FALSE"
    return x


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        escaped = v.replace("'", "''")
        return f"'{escaped}'"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "(" + ", ".join(_lit(x) for x in v) + ")"
    raise QueryTranslationError(f"unsupported literal type: {type(v).__name__}")


def _null_forcing_cols(node: ast.AST) -> set:
    """Columns whose null forces this VALUE expression to evaluate null
    (null-propagating arithmetic / casts / the whitelisted calls). Mirrors
    Series._strict_cols for the query grammar."""
    if isinstance(node, ast.Name):
        if node.id.startswith("__at__"):
            return set()  # @env literal, not a column
        return {node.id}
    if isinstance(node, ast.BinOp):
        return _null_forcing_cols(node.left) | _null_forcing_cols(node.right)
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
        return _null_forcing_cols(node.operand)
    if isinstance(node, ast.Call):
        out: set = set()
        for a in node.args:
            out |= _null_forcing_cols(a)
        return out
    return set()


def _proof_cols(node: ast.AST) -> set:
    """Columns proven non-null on rows the translated predicate KEEPS.

    Comparison atoms compile null-rejecting for ==/</<=/>/>=/in (a null
    operand evaluates FALSE), so an atom that held proves its operands'
    null-forcing columns non-null; conjunction unions proofs, disjunction
    intersects. != / not-in evaluate TRUE on null operands (pandas NaN
    semantics) and NOT can flip a null-driven FALSE to TRUE, so none of
    those prove anything. Feeds frame._nonnull_cols -> the merge
    plain-equality fast path."""
    if isinstance(node, ast.BoolOp):
        sets = [_proof_cols(v) for v in node.values]
        if isinstance(node.op, ast.And):
            return set().union(*sets)
        out = sets[0]
        for s in sets[1:]:
            out &= s
        return out
    if isinstance(node, ast.Compare):
        out: set = set()
        left = node.left
        for op, comparator in zip(node.ops, node.comparators):
            if not isinstance(op, (ast.NotEq, ast.NotIn)):
                out |= _null_forcing_cols(left)
                out |= _null_forcing_cols(comparator)
            left = comparator
        return out
    return set()


def query_proof_columns(expr: str) -> frozenset:
    """Public entry: non-null proof column set for a pandas query expression
    (empty set on any parse problem — proofs are an optimization only)."""
    try:
        tree = ast.parse(expr.replace("@", "__at__"), mode="eval")
        if _has_const_atom(tree.body):
            # scalar-logic trees run the bitwise integer path whose row
            # selection is not the boolean atoms' — prove nothing
            return frozenset()
        return frozenset(_proof_cols(tree.body))
    except Exception:
        return frozenset()


def translate_query_expr(
    expr: str, env: dict | None = None, boolean_context: bool = True
) -> str:
    """Translate a pandas query expression into a Spark SQL expression.

    Supports the reference grammar (core/query.py:33-311): comparisons, arithmetic,
    and/or/not, `in`, chained comparisons, and ``@var`` external references
    (resolved from ``env``). ``boolean_context=True`` is the query()/filter
    contract (result used as a row predicate); ``False`` is the eval() VALUE
    contract, where a column-free expression must yield its literal value
    (pandas: ``(1 < 2) * 5`` evaluates to 5, ``not (0 <= 0)`` to -2), never
    a row-selection boolean.
    """
    src = expr.replace("@", "__at__")
    try:
        tree = ast.parse(src, mode="eval")
    except SyntaxError as exc:
        raise QueryTranslationError(f"cannot parse query expression: {expr!r}") from exc
    if _has_const_atom(tree.body):
        # pandas evaluates column-free atoms as Python scalars under the
        # &/|/~ mapping — `not (0 <= 0)` is ~True == -2, and combining an
        # int scalar with a boolean mask follows the bitwise-collapse rules
        # in _combine_scalar_logic. Rare in real queries (the plain boolean
        # path below keeps its clean pushdown-friendly plan); exact here.
        if not boolean_context:
            if not _column_names(tree.body):
                # fully constant VALUE: emit the Python result as a literal
                return _lit(_py_const_eval(tree.body, env))
            if not isinstance(
                tree.body, (ast.BoolOp, ast.UnaryOp, ast.Compare)
            ):
                # columned arithmetic with an embedded constant atom (e.g.
                # `a + (1 < 2)`) — pandas adds the scalar; the plain SQL
                # form below fails loudly at Spark analysis (bool in
                # arithmetic), same as before the scalar-logic compiler
                return _emit(tree.body, env)
        return _finish_scalar_logic(_emit_scalar_logic(tree.body, env))
    return _emit(tree.body, env)
