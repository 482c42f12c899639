"""Machine-runner for the reference's YAML conformance corpus.

Loads cases from /root/reference/cases/function/**/*.yaml (format:
inputs[].columns/rows + sql + expect.columns/rows/order, optional
dataProvider/expectProvider parameterization — see the reference's
hybridse/src/case/sql_case.cc for the canonical loader this re-implements
the data model of), builds the input tables as Ray Datasets, runs the SQL
through openmldb_ray.sql, and diffs against the expectation.

Skip policy: a case is skipped when its ``mode`` includes
``offline-unsupport`` or ``batch-unsupport`` (the reference's own offline
batch engine skips those too) or when it uses features we don't claim
(marked by the runner raising SqlLowerError -> recorded as "unsupported",
NOT as pass).  ``expect.success == false`` cases pass when our engine
raises.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa

_SKIP_MODES = ("offline-unsupport", "batch-unsupport", "hybridse-only",
               "rtidb-batch-unsupport", "batch-request-unsupport")

# Documented divergences from the reference corpus, keyed by
# (file-name substring, case id).  Each maps to (status, reason).
_KNOWN_DIVERGENCES = {
    # Expects sum over an EMPTY union-window frame (ROWS 4 PREC..1 PREC,
    # union rows all later than the primary row) to be 0, contradicting
    # the same file's id 7 (identical frame, no union -> NULL) and the
    # sum UDAF's own output codegen (default_udf_library.cc:123-132:
    # flag-set -> CAST(NULL)).  We follow id 7's NULL semantics.
    ("test_window.yaml", 31): (
        "skip", "reference-quirk: empty union-window sum expected 0, "
        "corpus-inconsistent with id 7 (NULL)"),
    # Expected compile failure because the join key is not covered by a
    # storage index of the right-side table.  A Ray Data engine has no
    # storage indexes — LAST JOIN shuffles/broadcasts on any key — so
    # the physical-plan index requirement is deliberately relaxed.
    ("test_lastjoin_complex.yaml", 16): (
        "unsupported", "index-requirement not modeled: Ray engine joins "
        "on arbitrary keys (reference requires right-side index)"),
    # Same index/physical-plan restriction family: joins over DERIVED
    # tables (subquery output has no storage index; the reference's
    # planner rejects them, a Ray shuffle join runs them fine)
    ("test_lastjoin_complex.yaml", "11-2"): (
        "unsupported", "index-requirement not modeled: LAST JOIN over a "
        "derived (subquery) left table runs here; reference requires an "
        "indexed physical table"),
    ("test_lastjoin_complex.yaml", "13-2"): (
        "unsupported", "index-requirement not modeled: right-subquery join "
        "key and order ts from different source tables is fine for a "
        "shuffle join; reference requires one indexed main table"),
    # Online storage deletes per-INDEX entries: a row deleted through one
    # index stays visible to windows scanning another index (dml/
    # test_delete.yaml id 17 expects the c1-deleted row to still feed the
    # c2-partitioned window). Offline DELETE removes whole rows.
    ("test_delete.yaml", 17): (
        "unsupported", "per-index delete visibility not modeled: offline "
        "DELETE removes whole rows (online index-entry semantics)"),
    # The reference harness treats an input cell spelled "null" (quoted
    # string) and SQL NULL as the same value after a csv round trip; we
    # keep the 4-char string distinct (function/out_in/test_out_in.yaml
    # id 17's cat expectation REQUIRES the string to survive — the corpus
    # is inconsistent between the two files).
    ("test_select_into_load_data.yaml", 1): (
        "unsupported", "quoted-'null' string vs NULL equivalence after csv "
        "round trip (corpus-inconsistent with test_out_in id 17)"),
    ("test_select_into_load_data.yaml", "17-2"): (
        "unsupported", "quoted-'null' string vs NULL equivalence after csv "
        "round trip (corpus-inconsistent with test_out_in id 17)"),
    # Spark writes csv exports as part-file DIRECTORIES; mode=append adds
    # part files, and a header=true read then consumes the first line of
    # EVERY part (losing one data row per headerless part). We model a
    # single csv file per export.
    ("test_select_into_load_data.yaml", "9-2"): (
        "unsupported", "Spark part-file-per-append header consumption not "
        "modeled (single-file csv exports)"),
    ("test_select_into_load_data.yaml", "10-1"): (
        "unsupported", "Spark part-file-per-append header consumption not "
        "modeled (single-file csv exports)"),
    ("test_select_into_load_data.yaml", "10-2"): (
        "unsupported", "Spark part-file-per-append header consumption not "
        "modeled (single-file csv exports)"),
    # id 37-1 (standalone) expects an online LOAD with the default mode to
    # succeed while ids 39/40 ("cluster") expect exactly that to fail; we
    # implement the cluster rule (online = append-only).
    ("test_select_into_load_data.yaml", "37-1"): (
        "unsupported", "standalone online LOAD default-mode allowance "
        "contradicts ids 39/40 (cluster append-only rule implemented)"),
    # LIMIT without ORDER BY: which rows survive is storage-iteration
    # order (reference skiplist ts-desc); plain SELECTs compare count-only
    # via _limit_without_order, but these round-trip the limited rows
    # through a file so values get compared.
    ("test_select_into_load_data.yaml", (65, "limit")): (
        "unsupported", "LIMIT without ORDER BY row identity is "
        "storage-iteration order (not meaningful for a batch engine)"),
    ("test_select_into_load_data.yaml", (66, "limit")): (
        "unsupported", "LIMIT without ORDER BY row identity is "
        "storage-iteration order (not meaningful for a batch engine)"),
    # Online STORAGE semantics (not query semantics): disk tables dedup
    # inserts on identical (index key, ts); ttl_type=latest/absolute evicts
    # rows before a SELECT sees them; {currentTime} rows only matter for
    # eviction. The reference's own OFFLINE engine reads full data and
    # ignores TTL too — these cases test the online storage node.
    ("disk_table.yaml", 12): (
        "unsupported", "disk-table (key,ts) insert dedup is online storage "
        "behavior (offline reads keep all rows)"),
    ("disk_table.yaml", 13): (
        "unsupported", "disk-table (key,ts) insert dedup is online storage "
        "behavior (offline reads keep all rows)"),
    ("disk_table.yaml", 15): (
        "unsupported", "ttl_type=latest eviction is online storage behavior "
        "(reference offline ignores TTL as well)"),
    ("disk_table.yaml", 16): (
        "unsupported", "absolute-TTL eviction with {currentTime} rows is "
        "online storage behavior"),
    ("disk_table.yaml", 17): (
        "unsupported", "absolute-TTL eviction with {currentTime} rows is "
        "online storage behavior"),
    ("disk_table.yaml", 18): (
        "unsupported", "absolute-TTL eviction with {currentTime} rows is "
        "online storage behavior"),
    ("test_data_expiration.yaml", 0): (
        "unsupported", "ttl_type=latest eviction is online storage behavior "
        "(reference offline ignores TTL as well)"),
    ("test_data_expiration.yaml", 16): (
        "unsupported", "absolute-TTL eviction with {currentTime} rows is "
        "online storage behavior"),
}

_TYPE_BUILDERS = {
    "smallint": pa.int16(), "int16": pa.int16(),
    "int": pa.int32(), "int32": pa.int32(),
    "bigint": pa.int64(), "int64": pa.int64(), "long": pa.int64(),
    "float": pa.float32(), "double": pa.float64(),
    "string": pa.string(), "varchar": pa.string(),
    "timestamp": pa.timestamp("ms"), "date": pa.date32(),
    "bool": pa.bool_(), "boolean": pa.bool_(),
}


@dataclass
class CaseOutcome:
    file: str
    case_id: object
    desc: str
    variant: str          # dataProvider combo, "" if none
    status: str           # pass | fail | xfail_pass | unsupported | skip | error
    detail: str = ""


def parse_col_def(s: str) -> tuple[str, str]:
    # "c1 string" but also "c2 + 1 int" (unaliased expr names keep spaces),
    # "col1:bool" (cases/query colon style), "id int NOT NULL" modifiers
    import re as _re

    s = _re.sub(r"\s+not\s+null\s*$", "", s.strip(), flags=_re.I)
    parts = s.strip().rsplit(None, 1)
    if len(parts) == 1 and ":" in parts[0]:
        name, _, ty = parts[0].rpartition(":")
        return name.strip(), ty.strip().lower()
    return parts[0], parts[1].lower()


def _to_cell(v, ty: str):
    if v is None:
        return None
    if isinstance(v, str) and v.strip().upper() == "NULL":
        # for STRING cells only all-caps "NULL" is a null marker — a quoted
        # lowercase 'null' is the 4-char string (test_out_in.yaml id 17
        # writes it verbatim while real NULLs take null_value); for typed
        # cells any case is a marker
        if ty in ("string", "varchar") and v.strip() != "NULL":
            pass
        else:
            return None
    if isinstance(v, str) and ty in ("smallint", "int", "bigint", "int16",
                                     "int32", "int64", "long"):
        return int(v)
    if isinstance(v, str) and ty in ("float", "double"):
        return float(v)
    if ty == "timestamp":
        if isinstance(v, str) and v.strip().lstrip("-").isdigit():
            v = int(v)
        if isinstance(v, (int, float)):
            return pd.Timestamp(int(v), unit="ms")
        return pd.Timestamp(v)
    if ty == "date":
        if isinstance(v, str):
            return pd.Timestamp(v).date()
        return v
    if ty in ("bool", "boolean"):
        if isinstance(v, str):
            return v.lower() == "true"
        return bool(v)
    if ty in ("string", "varchar"):
        # the reference's case loader unescapes row strings ("\\" -> "\")
        # reference case loader C-unescapes row strings: \\ -> \, \x -> x
        import re as _re
        return _re.sub(r"\\(.)",
                       lambda m: {"n": "\n", "t": "\t"}.get(m.group(1),
                                                            m.group(1)),
                       str(v))
    return v


def build_table(columns: list[str], rows: list | None) -> pa.Table:
    defs = [parse_col_def(c) for c in columns]
    rows = rows or []
    arrays = []
    for j, (name, ty) in enumerate(defs):
        vals = [_to_cell(r[j], ty) for r in rows]
        patype = _TYPE_BUILDERS.get(ty)
        if patype is None:
            raise ValueError(f"unknown column type {ty!r}")
        arrays.append(pa.array(vals, patype))
    names = [d[0] for d in defs]
    arrays.append(pa.array(np.arange(len(rows), dtype=np.int64)))
    names.append("__rid")
    return pa.Table.from_arrays(arrays, names=names)


def _cols_from_create(create_sql: str) -> list[str]:
    """Column defs from a CREATE TABLE statement (dml/multi_insert.yaml
    style inputs); index(...) entries are ignored (no index modeling)."""
    import re

    m = re.search(r"\((.*)\)\s*;?\s*$", create_sql, re.S)
    if not m:
        raise Unsupported(f"unparsed create: {create_sql[:60]!r}")
    parts, depth, cur = [], 0, ""
    for ch in m.group(1):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append(cur)
            cur = ""
        else:
            cur += ch
    if cur.strip():
        parts.append(cur)
    cols = []
    for p in parts:
        t = p.strip()
        if not t or t.lower().startswith(("index", "primary", "key")):
            continue
        toks = t.split()
        cols.append(f"{toks[0]} {toks[1].lower()}")
    return cols


def _insert_lit(tok: str):
    t = tok.strip()
    low = t.lower()
    if low == "null":
        return None
    if low in ("true", "false"):
        return low == "true"
    if t == "?":
        return "?"
    t2 = t.rstrip("fFlLdD")  # numeric literal suffixes (3.3f, 5L)
    try:
        if "." in t2 or "e" in t2.lower():
            return float(t2)
        return int(t2)
    except ValueError:
        return t


def _parse_value_tuples(s: str) -> list[list]:
    tuples: list[list] = []
    cur = None
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "(":
            cur = []
            i += 1
        elif ch == ")":
            if cur is not None:
                tuples.append(cur)
            cur = None
            i += 1
        elif ch in ", \t\r\n;":
            i += 1
        elif ch in "\"'":
            q = ch
            i += 1
            buf = ""
            while i < n and s[i] != q:
                if s[i] == "\\" and i + 1 < n:
                    i += 1
                buf += s[i]
                i += 1
            i += 1
            if cur is not None:
                cur.append(buf)
        else:
            j = i
            while j < n and s[j] not in ",) \t\r\n":
                j += 1
            if cur is not None:
                cur.append(_insert_lit(s[i:j]))
            i = j
    return tuples


def _rows_from_insert(stmts: str, cols: list[str],
                      param_rows: list | None) -> list:
    """Rows from INSERT INTO ... VALUES statements; '?' placeholders take
    one parameter row each (test_insert_prepared.yaml)."""
    import re

    names = [c.split()[0] for c in cols]
    out: list = []
    for stmt in re.split(r";", stmts):
        stmt = stmt.strip()
        if not stmt:
            continue
        m = re.match(r"insert\s+into\s+\S+\s*(?:\(([^)]*)\))?\s*"
                     r"values\s*(.*)$", stmt, re.I | re.S)
        if not m:
            raise Unsupported(f"unparsed insert: {stmt[:60]!r}")
        collist = ([c.strip() for c in m.group(1).split(",")]
                   if m.group(1) else names)
        for tup in _parse_value_tuples(m.group(2)):
            if any(v == "?" for v in tup):
                for prow in (param_rows or []):
                    d = dict(zip(collist, list(prow)))
                    out.append([d.get(nm) for nm in names])
            else:
                d = dict(zip(collist, tup))
                out.append([d.get(nm) for nm in names])
    return out


def _schema_to_columns(s: str) -> list[str]:
    """`"col0:string, col1:int32"` → `["col0 string", "col1 int32"]`
    (cases/query + resource-file style)."""
    return [c.strip().replace(":", " ", 1) for c in str(s).split(",")
            if c.strip()]


def _data_to_rows(s: str) -> list[list]:
    """CSV-ish `data: |` block → row lists (NULL/empty → None)."""
    rows = []
    for line in str(s).strip().splitlines():
        cells = [c.strip() for c in line.split(",")]
        rows.append([None if c in ("NULL", "null", "") else c
                     for c in cells])
    return rows


def build_tables(case: dict):
    import ray.data as rd

    tables = {}
    for i, inp in enumerate(case.get("inputs") or []):
        if inp.get("resource") is not None:
            # cases/query style indirection: the input is a shared table
            # defined in cases/resource/*.yaml under a `table:` key
            # (engine_test_base.cc resource loading); fields given inline
            # on the input override the resource's
            import yaml as _yaml

            rpath = os.path.join("/root/reference", str(inp["resource"]))
            rtable = (_yaml.safe_load(open(rpath)) or {}).get("table") or {}
            inp = {**rtable, **{k: v for k, v in inp.items()
                                if k != "resource"}}
        cols = inp.get("columns")
        rows = inp.get("rows")
        if cols is None and inp.get("schema") is not None:
            # "schema: col0:string, col1:int32" + "data:" CSV inputs
            # (select/test_where.yaml + cases/query style)
            cols = _schema_to_columns(inp["schema"])
        elif cols is None and inp.get("create") is not None:
            cols = _cols_from_create(str(inp["create"]))
            ins = inp.get("insert") or inp.get("inserts")
            if isinstance(ins, list):
                ins = ";".join(str(x) for x in ins)
            if ins:
                rows = _rows_from_insert(str(ins), cols, rows)
            elif rows is None:
                rows = []
        if rows is None and inp.get("data") is not None:
            # CSV-ish "data: |" blocks (window_attributes.yaml style)
            rows = _data_to_rows(inp["data"])
        if cols is None:
            # no columns/schema/create on the input
            raise Unsupported("input without columns (DDL create)")
        repeat = int(inp.get("repeat", 1))
        if repeat > 1 and rows:
            rows = [r for r in rows for _ in range(repeat)]
        t = build_table(cols, rows)
        ds = rd.from_arrow(t)
        tables[f"__tbl{i}__"] = ds
        tables.setdefault(f"t{i}", ds)   # bare tN refs used by some cases
        names = [f"t{i}", f"__tbl{i}__"]
        if inp.get("name"):
            tables[str(inp["name"])] = ds
            names.append(str(inp["name"]))
        # own-db qualified refs resolve; a WRONG db prefix stays
        # unresolved and errors (test_out_in.yaml ids 4/6) — inputs may
        # override the case db per table (cross-database queries)
        db = inp.get("db") or case.get("db")
        if db:
            for nm in names:
                tables[f"{db}.{nm}"] = ds
    return tables


class Unsupported(Exception):
    pass


def expand_variants(case: dict):
    """Yield (variant_label, sql_text, expect_dict) per dataProvider combo."""
    sql = case.get("sql")
    dp = case.get("dataProvider")
    base_expect = case.get("expect") or {}
    if not dp:
        yield "", sql, base_expect
        return
    ep = case.get("expectProvider") or {}
    # cartesian product over provider dimensions (corpus uses 1-2)
    import itertools

    dims = [list(enumerate(d)) for d in dp]
    for combo in itertools.product(*dims):
        s = sql
        for d_idx, (v_idx, val) in enumerate(combo):
            s = s.replace(f"d[{d_idx}]", str(val))
        # expect override lookup: ep[i] or ep[i][j]
        exp = dict(base_expect)
        node = ep
        for depth, (v_idx, _val) in enumerate(combo):
            if not isinstance(node, dict):
                break
            hit = node.get(v_idx)
            if hit is None:
                break
            if depth == len(combo) - 1 and isinstance(hit, dict) and (
                    "rows" in hit or "columns" in hit or "success" in hit
                    or "order" in hit):
                exp = {**exp, **hit}
            node = hit
        label = "/".join(str(v) for _, v in combo)
        yield label, s, exp


def _norm_cell(v, ty: str):
    """Normalize an actual result cell to the expected type's domain."""
    if isinstance(v, float) and math.isnan(v) and ty in ("float", "double"):
        return float("nan")   # scalar NaN results are distinct from NULL
    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return None
    if ty == "timestamp":
        if isinstance(v, pd.Timestamp):
            return int(v.value // 10**6)
        if isinstance(v, (np.integer, int)):
            return int(v)
        return int(pd.Timestamp(v).value // 10**6)
    if ty == "date":
        if hasattr(v, "strftime"):
            return v.strftime("%Y-%m-%d")
        return str(v)
    if ty in ("bool", "boolean"):
        return bool(v)
    if ty in ("smallint", "int", "bigint", "int16", "int32", "int64"):
        if isinstance(v, float) and not v.is_integer():
            return v  # type violation shows as value diff
        return int(v)
    if ty in ("float", "double"):
        return float(v)
    if ty in ("string", "varchar"):
        return str(v)
    return v


def _norm_expected(v, ty: str):
    if v is None:
        return None
    if isinstance(v, str) and v.upper() == "NULL":
        return None
    if ty == "timestamp":
        if isinstance(v, (int, float)):
            return int(v)
        if isinstance(v, str) and v.strip().lstrip("-").isdigit():
            return int(v)  # epoch-ms literal (cases/query data blocks)
        return int(pd.Timestamp(v).value // 10**6)
    if ty == "date":
        return str(v)
    if ty in ("bool", "boolean"):
        if isinstance(v, str):
            return v.lower() == "true"
        return bool(v)
    if ty in ("smallint", "int", "bigint", "int16", "int32", "int64"):
        return int(v)
    if ty in ("float", "double"):
        return float(v)
    if ty in ("string", "varchar"):
        return str(v)
    return v


def _cells_equal(exp, act, ty: str) -> bool:
    if exp is None and act is None:
        return True
    if exp is None or act is None:
        return False
    if ty in ("float", "double"):
        en = isinstance(exp, float) and math.isnan(exp)
        an = isinstance(act, float) and math.isnan(act)
        if en or an:
            return en and an
    if ty == "float":
        if math.isnan(exp) and math.isnan(act):
            return True
        return math.isclose(float(exp), float(act), rel_tol=2e-5, abs_tol=1e-5)
    if ty == "double":
        if math.isnan(exp) and math.isnan(act):
            return True
        # corpus double literals are sometimes hand-rounded (e.g. 30.66667
        # for 92/3, integration_test test_window_union.yaml id 23)
        return math.isclose(float(exp), float(act), rel_tol=1e-6, abs_tol=1e-6)
    return exp == act


def compare_result(expect: dict, actual: pd.DataFrame, *,
                   rows_indeterminate: bool = False) -> str | None:
    """None if match else a diff description."""
    exp_cols = expect.get("columns")
    exp_rows = expect.get("rows")
    if exp_cols is None and expect.get("schema") is not None:
        exp_cols = _schema_to_columns(expect["schema"])
    if exp_rows is None and expect.get("data") is not None:
        exp_rows = _data_to_rows(expect["data"])
    if rows_indeterminate and exp_rows is not None:
        # LIMIT without result ORDER BY: row identity is storage-order-
        # dependent — check schema + row count only
        if len(actual) != len(exp_rows):
            return f"count {len(actual)} != {len(exp_rows)}"
        exp_rows = None
    if exp_cols is None and exp_rows is None:
        if "count" in expect:
            if len(actual) != int(expect["count"]):
                return f"count {len(actual)} != {expect['count']}"
        return None
    defs = [parse_col_def(c) for c in (exp_cols or [])]
    names = [d[0] for d in defs]
    if len(actual) == 0 and not exp_rows:
        return None   # empty result: schema may be absent from empty datasets
    if exp_cols is not None:
        import re as _re
        actual_names = [c for c in actual.columns if c != "__rid"]
        norm = lambda n: _re.sub(r"__dup\d+$", "", n.lower().replace(" ", ""))
        if [norm(n) for n in actual_names] != [norm(n) for n in names]:
            return f"columns {actual_names} != {names}"
    if exp_rows is None:
        return None

    order = expect.get("order")
    keep_idx = [i for i, c in enumerate(actual.columns) if c != "__rid"]
    mat = actual.to_numpy(dtype=object)
    act_rows = [[row[i] for i in keep_idx] for row in mat]

    exp_norm = [[_norm_expected(v, defs[j][1]) for j, v in enumerate(r)]
                for r in exp_rows]
    act_norm = [[_norm_cell(v, defs[j][1]) for j, v in enumerate(r)]
                for r in act_rows]

    if len(exp_norm) != len(act_norm):
        return f"row count {len(act_norm)} != {len(exp_norm)}"

    def sort_key(rows, by_idx):
        def k(r):
            out = []
            for i in by_idx:
                v = r[i]
                out.append((v is None, str(type(v).__name__), str(v)))
            return out
        return sorted(rows, key=k)

    if order:
        order_cols = [order] if isinstance(order, str) else list(order)
        try:
            by_idx = [names.index(c) for c in order_cols]
        except ValueError:
            by_idx = list(range(len(names)))
    else:
        by_idx = list(range(len(names)))
    exp_norm = sort_key(exp_norm, by_idx)
    act_norm = sort_key(act_norm, by_idx)

    for i, (er, ar) in enumerate(zip(exp_norm, act_norm)):
        for j, (ev, av) in enumerate(zip(er, ar)):
            if not _cells_equal(ev, av, defs[j][1]):
                return (f"row {i} col {names[j]}: expected {ev!r} got {av!r}\n"
                        f"  expected row: {er}\n  actual row:   {ar}")
    return None


def should_skip(case: dict) -> str | None:
    mode = str(case.get("mode") or "")
    for m in _SKIP_MODES:
        if m in mode:
            return f"mode:{m}"
    if case.get("sql") is None and not case.get("sqls"):
        return "no sql"
    tags = case.get("tags") or []
    if any("TODO" in str(t) for t in tags):
        # the reference's own runner skips TODO-tagged cases (recorded bugs)
        return "tagged TODO"
    if case.get("sqls") and "delete" in str(case["sqls"]).lower():
        # online TTL eviction (index spec `idx:key:ts:N:latest`) changes
        # which rows a post-delete SELECT sees; an offline engine has no
        # eviction, so those cases are out of scope
        for inp in case.get("inputs") or []:
            for spec in ((inp.get("indexs") or inp.get("index") or [])
                         if isinstance(inp, dict) else []):
                parts = str(spec).split(":")
                if len(parts) >= 4 and parts[3].strip() not in ("", "0"):
                    return "online TTL eviction semantics"
    if case.get("sqls") and not case.get("sql"):
        # multi-statement scripts run when every statement is offline-
        # expressible (SELECT / SELECT INTO OUTFILE / LOAD DATA / catalog
        # no-ops); online-state statements make the case inapplicable
        for s in case["sqls"]:
            head = str(s).strip().split()[0].lower() if str(s).strip() else ""
            if head == "insert":
                return f"multi-statement {head} side effects"
            if head not in ("select", "load", "create", "desc", "show",
                            "set", "deploy", "drop", "delete"):
                return f"multi-statement:{head}"
        if not any(str(s).strip().lower().startswith("select")
                   for s in case["sqls"]) \
                and not (case.get("expect") or {}).get("cat"):
            return "multi-statement: no query statement"
        return None
    if case.get("standard_sql") is False:
        pass
    sql = case.get("sql") or ""
    low = sql.lower()
    for kw in ("insert ", "create ", "deploy ", "load data", "delete "):
        if low.strip().startswith(kw.strip()):
            return f"non-select:{kw.strip()}"
    return None


def run_case(case: dict, file_label: str = "") -> list[CaseOutcome]:
    from ..functions import scalar as scalar_fns
    from .engine import run_sql

    # the reference corpus expectations were recorded under UTC+8
    # (4Paradigm CI, Asia/Shanghai): date_format/hour/string(timestamp)
    # outputs embed that offset
    out: list[CaseOutcome] = []
    cid = case.get("id")
    desc = str(case.get("desc") or "")

    reason = should_skip(case)
    if reason:
        return [CaseOutcome(file_label, cid, desc, "", "skip", reason)]

    for (fsub, kid), (status, why) in _KNOWN_DIVERGENCES.items():
        want_desc = None
        if isinstance(kid, tuple):
            kid, want_desc = kid
        if fsub in file_label and cid == kid and \
                (want_desc is None or want_desc in desc):
            return [CaseOutcome(file_label, cid, desc, "", status, why)]

    scalar_fns.set_timezone_offset_ms(8 * 3600 * 1000)
    try:
        return _run_case_variants(case, file_label, out)
    finally:
        scalar_fns.set_timezone_offset_ms(0)


def _run_case_variants(case, file_label, out):
    from .engine import run_sql

    cid = case.get("id")
    desc = str(case.get("desc") or "")
    # {N} placeholders must resolve to the SAME qualifier as literal
    # mentions of the table's declared name (cases/query mixes `{1}.c3`
    # projections with `from t0 last join t1`): substitute named inputs
    # textually; unnamed ones keep the lexer's reserved __tblN__ namespace
    def _input_name(inp) -> str | None:
        if not isinstance(inp, dict):
            return None
        if inp.get("name"):
            return str(inp["name"])
        if inp.get("resource"):
            import yaml as _yaml

            rpath = os.path.join("/root/reference", str(inp["resource"]))
            rt = (_yaml.safe_load(open(rpath)) or {}).get("table") or {}
            return str(rt["name"]) if rt.get("name") else None
        return None

    named = {i: nm for i, inp in enumerate(case.get("inputs") or [])
             if (nm := _input_name(inp))}
    for label, sql, expect in expand_variants(case):
        expect_fail = expect.get("success") is False
        if sql is None and case.get("sqls"):
            stmts = [str(st) for st in case["sqls"]]
            for i in range(len(case.get("inputs") or [])):
                nm = named.get(i, f"t{i}")
                stmts = [st.replace(f"{{{i}}}", nm) for st in stmts]
            try:
                tables = build_tables(case)
                actual, script_tmp = _run_script(
                    stmts, tables, str(case.get("db") or "") or None,
                    indexes=_case_indexes(case, named))
            except Unsupported as e:
                out.append(CaseOutcome(file_label, cid, desc, label,
                                       "unsupported", str(e)))
                continue
            except Exception as e:
                if expect_fail:
                    out.append(CaseOutcome(file_label, cid, desc, label,
                                           "xfail_pass", type(e).__name__))
                    continue
                detail = f"{type(e).__name__}: {e}"
                out.append(CaseOutcome(file_label, cid, desc, label,
                                       "error", detail[:400]))
                continue
            if expect_fail:
                out.append(CaseOutcome(file_label, cid, desc, label, "fail",
                                       "expected failure but script succeeded"))
                continue
            if expect.get("cat"):
                # written-file content check (order-insensitive lines)
                cat = expect["cat"]
                base = os.path.basename(str(cat.get("path")))
                for i in range(len(case.get("inputs") or [])):
                    base = base.replace(f"{{{i}}}", named.get(i, f"t{i}"))
                # outfiles land at the scratch root or (for {root_path}/out
                # paths) under out/
                fpath = os.path.join(script_tmp, base)
                if not os.path.isfile(fpath):
                    alt = os.path.join(script_tmp, "out", base)
                    if os.path.isfile(alt):
                        fpath = alt
                try:
                    with open(fpath) as fh:
                        got = sorted(ln.rstrip("\n") for ln in fh
                                     if ln.strip())
                except OSError as e:
                    out.append(CaseOutcome(file_label, cid, desc, label,
                                           "fail", f"cat: {e}"))
                    continue
                want = sorted(str(x) for x in cat.get("lines") or [])
                ok = got == want
                out.append(CaseOutcome(
                    file_label, cid, desc, label,
                    "pass" if ok else "fail",
                    "" if ok else f"file lines differ:\n got {got[:4]}\nwant {want[:4]}"))
                continue
            if actual is None:
                out.append(CaseOutcome(file_label, cid, desc, label,
                                       "unsupported", "script yielded no result"))
                continue
            diff = compare_result(expect, actual)
            out.append(CaseOutcome(file_label, cid, desc, label,
                                   "pass" if diff is None else "fail",
                                   (diff or "")[:400]))
            continue
        for i, nm in named.items():
            sql = sql.replace(f"{{{i}}}", nm)
        if case.get("parameters") and "?" in sql:
            sql = _substitute_params(sql, case["parameters"])
        try:
            if case.get("longWindow"):
                _validate_long_window(sql, case)
            tables = build_tables(case)
            if case.get("sqls"):
                # setup script preceding the query (e.g. test_delete ids
                # 4/17: deletes mutate the table, then `sql` reads it)
                setup = [str(st) for st in case["sqls"]]
                for i in range(len(case.get("inputs") or [])):
                    nm = named.get(i, f"t{i}")
                    setup = [st.replace(f"{{{i}}}", nm) for st in setup]
                _run_script(setup, tables,
                            str(case.get("db") or "") or None,
                            indexes=_case_indexes(case, named))
            ds = run_sql(sql, tables,
                         default_db=str(case.get("db") or "") or None)
            actual = _collect_arrow(ds)
        except Unsupported as e:
            out.append(CaseOutcome(file_label, cid, desc, label,
                                   "unsupported", str(e)))
            continue
        except Exception as e:  # engine rejected or crashed
            if expect_fail:
                out.append(CaseOutcome(file_label, cid, desc, label,
                                       "xfail_pass", type(e).__name__))
            else:
                detail = f"{type(e).__name__}: {e}"
                status = ("unsupported"
                          if "unsupported" in str(e).lower()
                          or "SqlLowerError" in type(e).__name__
                          else "error")
                out.append(CaseOutcome(file_label, cid, desc, label,
                                       status, detail[:400]))
            continue
        if expect_fail:
            out.append(CaseOutcome(file_label, cid, desc, label, "fail",
                                   "expected failure but query succeeded"))
            continue
        diff = compare_result(expect, actual,
                              rows_indeterminate=_limit_without_order(sql))
        if diff is None:
            out.append(CaseOutcome(file_label, cid, desc, label, "pass"))
        else:
            out.append(CaseOutcome(file_label, cid, desc, label, "fail",
                                   diff[:400]))
    return out


_PA_TY_NAME = {
    str(pa.int16()): "smallint", str(pa.int32()): "int",
    str(pa.int64()): "bigint", str(pa.float32()): "float",
    str(pa.float64()): "double", str(pa.string()): "string",
    str(pa.timestamp("ms")): "timestamp", str(pa.date32()): "date",
    str(pa.bool_()): "bool",
}



def _arrow_blocks(ds) -> "list[pa.Table]":
    """``ray.get(ds.to_arrow_refs())`` with pandas blocks converted:
    to_arrow_refs returns RAW block refs, and Ray's native ops (sort-based
    Aggregate in particular) emit pandas blocks for empty partitions, so a
    collector must not assume every block is an Arrow table.

    Empty pandas blocks are the trap inside the trap: schema inference on
    a 0-row object column yields Arrow ``null`` type, and the downstream
    ``pa.concat_tables`` in the typed writers raises ArrowInvalid against
    the real string blocks. 0-row pandas blocks are therefore dropped when
    ANY Arrow block exists (the Arrow blocks carry the schema); when no
    Arrow block exists they are cast to the dataset's unified schema."""
    import ray as _ray

    raw = _ray.get(ds.to_arrow_refs())
    conv, first_empty = [], None
    for t in raw:
        if isinstance(t, pd.DataFrame):
            if not len(t):
                if first_empty is None:
                    first_empty = t
                continue
            t = pa.Table.from_pandas(t, preserve_index=False) \
                .replace_schema_metadata(None)
        conv.append(t)
    if not conv and first_empty is not None:
        # every block was an empty pandas frame: no real schema exists
        # anywhere, so inference (null-typed, but the ONLY block — no
        # concat mismatch possible) at least preserves the column names
        conv.append(pa.Table.from_pandas(first_empty, preserve_index=False)
                    .replace_schema_metadata(None))
    return conv


def _parse_options(s: str | None) -> dict:
    """``OPTIONS(mode='append', header=false, delimiter=',')`` → dict
    (quote-aware: a delimiter value of ',' must not split the list)."""
    import re as _re

    opts: dict = {}
    if not s:
        return opts
    quoted: set = set()
    for m in _re.finditer(r"(\w+)\s*=\s*('([^']*)'|\"([^\"]*)\"|[^,\s)]+)", s):
        k = m.group(1).lower()
        if m.group(3) is not None or m.group(4) is not None:
            quoted.add(k)
            v = m.group(3) if m.group(3) is not None else m.group(4)
        else:
            v = m.group(2)
        opts[k] = v
    opts.pop("options", None)
    opts["__quoted"] = quoted
    return opts


_IO_OPT_KEYS = {"mode", "header", "delimiter", "quote", "null_value",
                "format", "coalesce", "deep_copy"}


def _validate_io_options(opts: dict) -> None:
    """Option validation per the reference's WriteOptions/ReadOptions
    (test_out_in.yaml ids 12/13/14/28/38): unknown keys, quoted booleans,
    and non-csv/parquet formats are errors."""
    q = opts.get("__quoted", set())
    for k in opts:
        if k != "__quoted" and k not in _IO_OPT_KEYS:
            raise ValueError(f"unknown option key {k!r}")
    h = opts.get("header")
    if h is not None and (h not in ("true", "false") or "header" in q):
        raise ValueError(f"header option must be bare true/false, got {h!r}")
    fmt = opts.get("format", "csv")
    if fmt not in ("csv", "parquet"):
        raise ValueError(f"unsupported format {fmt!r}")
    m = opts.get("mode")
    if m is not None and m.lower() not in ("overwrite", "append",
                                           "error_if_exists", "errorifexists"):
        raise ValueError(f"unsupported mode {m!r}")


def _write_parquet_typed(ds, path: str, opts: dict | None = None):
    """SELECT ... INTO OUTFILE options(format='parquet'): one parquet file
    at ``path`` (the runner controls both ends of the round-trip, so a
    single file stands in for the reference's Spark part-file directory)."""
    import pyarrow.parquet as pq

    import ray

    opts = opts or {}
    _validate_io_options(opts)
    mode = str(opts.get("mode", "error_if_exists")).lower()
    if mode in ("error_if_exists", "errorifexists") and os.path.exists(path):
        raise FileExistsError(path)
    tbls = [t for t in _arrow_blocks(ds)
            if t.num_rows or t.num_columns]
    tbl = pa.concat_tables(tbls) if tbls else pa.table({})
    out = tbl.select([c for c in tbl.column_names if c != "__rid"])
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if mode == "append" and os.path.exists(path):
        out = pa.concat_tables([pq.read_table(path), out])
    pq.write_table(out, path)
    return pd.DataFrame({c: pd.Series(out[c].to_pylist(), dtype=object)
                         for c in out.column_names})


def _write_csv_typed(ds, path: str, opts: dict | None = None) -> None:
    """SELECT ... INTO OUTFILE csv writer (SelectIntoPlan.scala defaults:
    header, comma delimiter, nulls as the literal ``null``, no quoting;
    options: mode=overwrite|append|error_if_exists, header, delimiter).
    Timestamps are written as epoch-ms ints so LOAD DATA round-trips
    bit-exactly; other types use the engine's SQL string rendering."""
    import ray

    from ..functions.scalar import to_string_sql

    opts = opts or {}
    _validate_io_options(opts)
    delim = opts.get("delimiter", ",")
    header = str(opts.get("header", "true")).lower() != "false"
    null_value = opts.get("null_value", "null")
    # default write mode is error_if_exists (SelectIntoPlan.scala:28-56;
    # test_out_in.yaml id 7)
    mode = str(opts.get("mode", "error_if_exists")).lower()
    tbls = [t for t in _arrow_blocks(ds) if t.num_rows or t.num_columns]
    tbl = pa.concat_tables(tbls) if tbls else None
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if mode in ("error_if_exists", "errorifexists") and os.path.exists(path):
        raise FileExistsError(path)
    names = [c for c in (tbl.column_names if tbl is not None else [])
             if c != "__rid"]
    lines = [delim.join(names)] if header else []
    cols = []
    for c in names:
        col = tbl[c].combine_chunks()
        if pa.types.is_timestamp(col.type):
            import pyarrow.compute as pc
            rendered = pc.cast(pc.cast(col, pa.timestamp("ms")), pa.int64())
            vals = [None if v is None else str(v) for v in rendered.to_pylist()]
        elif pa.types.is_floating(col.type):
            # reference csv float rendering is %f — 6 decimals
            # (test_out_in.yaml ids 17/18 cat expectations: 1.100000)
            vals = [None if v is None else "%f" % v for v in col.to_pylist()]
        else:
            vals = to_string_sql(col).to_pylist()
        cols.append([null_value if v is None else str(v) for v in vals])
    # NO quoting: the reference writer emits fields raw, so a value
    # containing the delimiter intentionally breaks the round-trip
    # (test_out_in.yaml id 34 expects that failure)
    for row in zip(*cols):
        lines.append(delim.join(row))
    with open(path, "a" if mode == "append" else "w") as f:
        f.write("\n".join(lines) + "\n")
    return pd.DataFrame({c: (tbl[c].to_pylist() if tbl is not None else [])
                         for c in names})


def _load_csv_typed(path: str, target_ds, opts: dict | None = None, *,
                    permissive: bool = False,
                    ragged_ok: bool = False) -> pa.Table:
    """LOAD DATA INFILE csv reader: the TARGET table's declared schema
    drives cell parsing (LoadDataPlan.scala:60-62 schema validation);
    ``null`` is the null literal, empty fields are NULL for non-strings
    and empty string for strings. A row whose field count disagrees with
    the header is a load error (matching the reference's strict parse)."""
    opts = opts or {}
    _validate_io_options(opts)
    delim = opts.get("delimiter", ",")
    has_header = str(opts.get("header", "true")).lower() != "false"
    schema = target_ds.schema()
    types = dict(zip(schema.names, schema.types))
    with open(path) as f:
        lines = [ln.rstrip("\n") for ln in f if ln.strip() != ""]
    table_cols = [c for c in schema.names if c != "__rid"]
    if has_header:
        header = [h.strip() for h in lines[0].split(delim)]
        rows = [ln.split(delim) for ln in lines[1:]]
        if permissive and set(header) != set(table_cols):
            # Spark importer: a non-matching header line is consumed and
            # columns bind positionally (select_into_load_data id 24)
            header = table_cols
    else:
        # headerless csv: the target table's declared column order applies
        header = table_cols
        rows = [ln.split(delim) for ln in lines]
    arrays, names = [], []
    for i, r in enumerate(rows):
        if len(r) != len(header):
            if not ragged_ok:
                raise ValueError(
                    f"csv row has {len(r)} fields, header has {len(header)}")
            # offline Spark permissive mode: truncate extras, pad missing
            rows[i] = (r + [""] * len(header))[:len(header)]
    tz_ms = 0
    try:
        from ..functions.scalar import get_timezone_offset_ms
        tz_ms = get_timezone_offset_ms()
    except ImportError:  # pragma: no cover
        pass
    null_marker = opts.get("null_value", "null")
    for j, name in enumerate(header):
        ty = types.get(name)
        tyname = _PA_TY_NAME.get(str(ty), "string")
        vals = []
        for r in rows:
            v = r[j].strip()
            if v == null_marker:
                vals.append(None)
            elif v == "" and tyname != "string":
                vals.append(None)
            elif tyname == "string":
                # csv strings are LITERAL — no backslash unescape (that
                # transform is for YAML row cells; string_escape.csv keeps
                # its backslashes verbatim)
                vals.append(v)
            elif tyname == "timestamp" and not v.lstrip("-").isdigit():
                # datetime strings in the corpus csvs are UTC+8 wall time
                # (timestamp_date.csv: 2020-05-29 15:56:29 = 1590738989000)
                try:
                    vals.append(pd.Timestamp(v)
                                - pd.Timedelta(milliseconds=tz_ms))
                except ValueError:
                    if not permissive:
                        raise
                    vals.append(None)
            else:
                try:
                    vals.append(_to_cell(v, tyname))
                except (ValueError, TypeError):
                    if not permissive:
                        raise
                    vals.append(None)  # Spark permissive: bad cell -> NULL
        arrays.append(pa.array(vals, _TYPE_BUILDERS[tyname]))
        names.append(name)
    arrays.append(pa.array(np.arange(len(rows), dtype=np.int64)))
    names.append("__rid")
    return pa.Table.from_arrays(arrays, names=names)


def _exec_delete(s: str, tables: dict, indexes: dict | None) -> None:
    """Offline DELETE (reference: delete-by-index-key from the offline
    store, cases/function/dml/test_delete.yaml). The WHERE must be an AND
    of ``col = literal`` terms matching EXACTLY the key columns of one of
    the table's declared indexes — OR, non-index columns, or partial
    composite keys are errors, as in the reference."""
    import re as _re

    import ray as _ray
    import ray.data as rd

    m = _re.match(r"delete\s+from\s+([\w.]+)\s+where\s+(.+)$", s,
                  _re.I | _re.S)
    if not m:
        raise ValueError(f"unparsed DELETE: {s[:80]!r}")
    tname, cond = m.group(1), m.group(2).strip()
    if tname not in tables:
        raise ValueError(f"DELETE from unknown table {tname!r}")
    if _re.search(r"\bor\b", cond, _re.I):
        raise ValueError("DELETE supports a single index key "
                         "(OR of keys is invalid, matches reference)")
    kv: dict[str, str] = {}
    for part in _re.split(r"\band\b", cond, flags=_re.I):
        pm = _re.match(r"\s*`?(\w+)`?\s*=\s*(.+?)\s*$", part, _re.S)
        if not pm:
            raise ValueError(f"DELETE condition must be col=value: {part!r}")
        kv[pm.group(1)] = pm.group(2)
    short = tname.split(".")[-1]
    meta = ((indexes or {}).get(tname)
            or (indexes or {}).get(short) or {})
    keysets = meta.get("keys", []) if isinstance(meta, dict) else meta
    if not any(set(ks) == set(kv) for ks in keysets):
        raise ValueError(f"DELETE key {sorted(kv)} does not match any index "
                         f"key of {tname!r} (matches reference)")

    tbls = [t for t in _arrow_blocks(tables[tname])
            if t.num_columns]
    if not tbls:
        return
    t = pa.concat_tables(tbls)
    import pyarrow.compute as pc

    mask = pa.array(np.ones(t.num_rows, dtype=bool))
    for col, lit in kv.items():
        if col not in t.column_names:
            raise ValueError(f"DELETE column {col!r} does not exist")
        arr = t[col]
        v = _delete_literal(lit, arr.type)
        eq = (pc.is_null(arr) if v is None
              else pc.fill_null(pc.equal(arr, pa.scalar(v, arr.type)), False))
        mask = pc.and_(mask, eq)
    new = rd.from_arrow(t.filter(pc.invert(mask)))
    # a table is registered under several aliases (short name, db-qualified,
    # reserved {N} placeholder); repoint EVERY alias of the same dataset
    old = tables[tname]
    for k, v in list(tables.items()):
        if v is old:
            tables[k] = new


def _delete_literal(lit: str, ty: pa.DataType):
    t = lit.strip()
    if t.lower() == "null":
        return None
    if t[:1] in "'\"" and t[-1:] == t[:1]:
        t = t[1:-1]
    if pa.types.is_string(ty):
        return t
    if pa.types.is_date(ty):
        return pd.Timestamp(t).date()
    if pa.types.is_timestamp(ty):
        return (pd.Timestamp(int(t), unit="ms")
                if t.lstrip("-").isdigit() else pd.Timestamp(t))
    if pa.types.is_boolean(ty):
        return t.lower() == "true"
    if pa.types.is_integer(ty):
        return int(t)
    return float(t)


def _case_indexes(case: dict, named: dict) -> dict:
    """{table_name: [[key cols], ...]} from the case inputs' ``indexs``
    declarations (``index1:c1|c2:c7[:ttl:type]`` → key cols before the
    second colon, composite split on ``|``)."""
    out: dict = {}
    for i, inp in enumerate(case.get("inputs") or []):
        if not isinstance(inp, dict):
            continue
        nm = named.get(i, f"t{i}")
        keysets, ts_cols = [], []
        for spec in (inp.get("indexs") or inp.get("index") or []):
            parts = str(spec).split(":")
            if len(parts) >= 2:
                keysets.append([c.strip() for c in parts[1].split("|")])
            if len(parts) >= 3 and parts[2].strip():
                ts_cols.append(parts[2].strip())
        out[nm] = {"keys": keysets, "ts": ts_cols}
    return out


def _run_script(stmts: list[str], tables: dict,
                default_db: str | None = None,
                indexes: dict | None = None) -> tuple:
    """Execute a multi-statement case script: catalog/online statements are
    offline no-ops, LOAD DATA / INTO OUTFILE round-trip through a temp dir,
    the LAST plain SELECT's result is returned for comparison. Returns
    (last_result_df_or_None, tmpdir) — tmpdir for expect.cat file checks."""
    import re as _re
    import tempfile

    import ray.data as rd

    from .engine import run_sql

    tmpdir = tempfile.mkdtemp(prefix="omr_outin_")
    last = None
    # the reference harness runs cases from its repo root with a
    # pre-created ./out scratch dir: {root_path}/cases/... are shipped
    # resource files, {root_path}/out/... is writable scratch
    os.makedirs(os.path.join(tmpdir, "out"), exist_ok=True)
    # Online/offline are SEPARATE stores in the reference: case inputs seed
    # the ONLINE store; the OFFLINE store starts empty and fills via
    # offline LOAD DATA (test_select_into_load_data.yaml round-trips online
    # -> csv -> offline -> csv -> online without double-counting). Scripts
    # that never switch modes keep the single shared store (legacy files).
    exec_mode = None  # set @@SESSION.execute_mode tracks online/offline
    offline_store: dict | None = None

    def _store() -> dict:
        nonlocal offline_store
        if exec_mode != "offline":
            return tables
        if offline_store is None:
            import ray as _ray

            cache: dict = {}
            offline_store = {}
            for k, v in tables.items():
                if id(v) not in cache:
                    tb = [t for t in _arrow_blocks(v)
                          if t.num_columns]
                    cache[id(v)] = (rd.from_arrow(tb[0].slice(0, 0))
                                    if tb else v)
                offline_store[k] = cache[id(v)]
        return offline_store

    for raw in stmts:
        s = (str(raw).strip().rstrip(";").strip()
             .replace("{root_path}/cases", "/root/reference/cases")
             .replace("{root_path}", tmpdir))
        if not s:
            continue
        head = s.split()[0].lower()
        if head == "drop":
            m = _re.match(r"drop\s+table\s+([\w{}.]+)", s, _re.I)
            if m:  # catalog change: applies to both stores
                tables.pop(m.group(1), None)
                if offline_store is not None:
                    offline_store.pop(m.group(1), None)
            continue
        if head == "create":
            m = _re.match(r"create\s+table\s+(?:if\s+not\s+exists\s+)?"
                          r"([\w.]+)", s, _re.I)
            if m:  # register an EMPTY table with the declared schema
                body = _re.sub(r"\)\s*options\s*\(.*\)\s*$", ")", s,
                               flags=_re.I | _re.S)
                empty = rd.from_arrow(build_table(_cols_from_create(body), []))
                tables[m.group(1)] = empty
                if offline_store is not None:
                    offline_store[m.group(1)] = empty
            continue  # create index / other DDL: offline no-op
        if head == "set":
            em = _re.search(r"execute_mode\s*=\s*['\"](\w+)['\"]", s, _re.I)
            if em:
                exec_mode = em.group(1).lower()
            continue
        if head in ("desc", "show", "deploy"):
            continue
        if head == "delete":
            _exec_delete(s, _store(), indexes)
            continue
        if head == "load":
            m = _re.match(r"load\s+data\s+infile\s*'([^']+)'\s+into\s+table\s+"
                          r"([\w{}.]+)\s*(options\s*\(.*\))?", s, _re.I | _re.S)
            if not m:
                raise Unsupported(f"unparsed LOAD DATA: {s[:60]!r}")
            path, tname = m.group(1), m.group(2)
            store = _store()
            if tname not in store:
                # a load error, not a harness gap (test_out_in.yaml id 26
                # expects failure)
                raise ValueError(f"LOAD DATA into unknown table {tname!r}")
            opts = _parse_options(m.group(3))
            mode = str(opts.get("mode", "error_if_exists")).lower()
            deep = str(opts.get("deep_copy", "true")).lower()
            import ray as _ray

            old = [x for x in _ray.get(store[tname].to_arrow_refs())
                   if x.num_rows]
            if exec_mode == "online":
                # cluster online import: append-only, deep copies only
                # (test_select_into_load_data ids 39/40/50)
                if mode != "append":
                    raise ValueError(
                        "online LOAD DATA supports only mode='append'")
                if deep == "false":
                    raise ValueError(
                        "online LOAD DATA cannot soft-copy (deep_copy=false)")
            elif exec_mode == "offline":
                if deep == "false" and mode in ("append", "overwrite") and old:
                    # a soft link cannot append to / overwrite an offline
                    # table that already holds data (ids 45/46/59; a first
                    # soft copy into an empty table is fine, 45-2/46-2/53)
                    raise ValueError("deep_copy=false cannot modify a "
                                     "non-empty offline table")
            if exec_mode is not None:
                if mode in ("error_if_exists", "errorifexists") and old:
                    raise ValueError(
                        f"table {tname!r} is not empty (mode=error_if_exists)")
                if mode == "overwrite":
                    old = []
            src = path[7:] if path.startswith("file://") else path
            if not os.path.isfile(src):
                # an earlier INTO OUTFILE in this script wrote basenames
                # into the scratch dir
                src = os.path.join(tmpdir, os.path.basename(path))
            if opts.get("format") == "parquet":
                import pyarrow.parquet as pq

                t = pq.read_table(src)
                t = t.append_column("__rid", pa.array(
                    np.arange(t.num_rows, dtype=np.int64)))
            else:
                # scripts that switch execute_mode are the CLUSTER corpus:
                # its Spark importer is permissive (bad cells -> NULL,
                # positional header, offline pads/truncates ragged rows);
                # the standalone importer (legacy scripts) is strict
                t = _load_csv_typed(src, store[tname], opts,
                                    permissive=exec_mode is not None,
                                    ragged_ok=exec_mode == "offline")
            if exec_mode == "online":
                # online rows are INSERTED: an index ts column may not be
                # NULL (select_into_load_data id 25-1: a header line read
                # as data yields a null ts -> the import job fails)
                meta = ((indexes or {}).get(tname)
                        or (indexes or {}).get(tname.split(".")[-1]) or {})
                for tscol in (meta.get("ts", [])
                              if isinstance(meta, dict) else []):
                    if tscol in t.column_names and t[tscol].null_count:
                        raise ValueError(
                            f"online LOAD: NULL ts value for index column "
                            f"{tscol!r}")
            # LOAD DATA appends to the table's existing rows
            # (test_out_in.yaml ids 31/33); renumber __rid so arrival
            # order stays the tiebreak
            if old:
                prev = pa.concat_tables(old).select(
                    [c for c in t.column_names if c != "__rid"])
                new = t.select(prev.column_names)
                merged = pa.concat_tables([prev, new])
                merged = merged.append_column(
                    "__rid", pa.array(np.arange(merged.num_rows,
                                                dtype=np.int64)))
                t = merged
            new_ds = rd.from_arrow(t)
            old_ds = store[tname]
            for k, v in list(store.items()):
                if v is old_ds:
                    store[k] = new_ds
            continue
        m = _re.search(r"\binto\s+outfile\s*'([^']+)'\s*(options\s*\(.*\))?\s*$",
                       s, _re.I | _re.S)
        if m:
            orig = m.group(1)
            orig = orig[7:] if orig.startswith("file://") else orig
            if os.path.dirname(orig) and not os.path.isdir(os.path.dirname(orig)):
                if exec_mode == "offline":
                    # the offline (Spark) writer creates missing dirs
                    # (test_select_into_load_data id 21-2)
                    os.makedirs(os.path.dirname(orig), exist_ok=True)
                else:
                    # online: nonexistent output folder is a write error
                    # (test_out_in.yaml id 21, select_into_load_data 21-1)
                    raise FileNotFoundError(f"output folder missing: {orig!r}")
            out_path = (orig if orig.startswith(tmpdir)
                        else os.path.join(tmpdir, os.path.basename(orig)))
            # INTO OUTFILE yields no result set, but a trailing export's
            # written rows satisfy count expectations (v040 id 0)
            out_opts = _parse_options(m.group(2))
            writer = (_write_parquet_typed
                      if out_opts.get("format") == "parquet"
                      else _write_csv_typed)
            last = writer(
                run_sql(s[:m.start()].strip(), _store(),
                        default_db=default_db),
                out_path, out_opts)
        else:
            last = _collect_arrow(run_sql(s, _store(),
                                          default_db=default_db))
    return last, tmpdir


def _substitute_params(sql: str, params: dict) -> str:
    """Inline `?` placeholders as typed literals (prepared-statement
    parameters, cases/query/parameterized_query.yaml: parameters.columns
    gives the types, parameters.rows the single value row)."""
    defs = [parse_col_def(c) for c in params.get("columns") or []]
    vals = (params.get("rows") or [[]])[0]
    lits = []
    for (_, ty), v in zip(defs, vals):
        if v is None:
            lits.append("NULL")
        elif ty in ("string", "varchar"):
            lits.append("'" + str(v).replace("'", "''") + "'")
        elif ty == "timestamp":
            lits.append(f"timestamp({int(v)})")
        elif ty == "date":
            lits.append(f"date('{v}')")
        elif ty in ("bool", "boolean"):
            lits.append("true" if str(v).lower() in ("true", "1") else "false")
        elif ty == "double":
            lits.append(repr(float(v)))
        else:  # exact-width numerics via the type(x) cast-function form
            lits.append(f"{ty}({v})")
    out, i, k, n = [], 0, 0, len(sql)
    in_str: str | None = None
    while i < n:
        ch = sql[i]
        if in_str:
            if ch == in_str:
                in_str = None
            out.append(ch)
        elif ch in "'\"":
            in_str = ch
            out.append(ch)
        elif ch == "?" and k < len(lits):
            out.append(lits[k])
            k += 1
        else:
            out.append(ch)
        i += 1
    return "".join(out)


def _validate_long_window(sql: str, case: dict | None = None) -> None:
    """Cases tagged ``longWindow`` deploy with the long-window pre-agg
    (RequestAggUnionRunner), whose aggregator has narrower rules than plain
    windows (hybridse long-window pass):

    - bucket size must be <N>[smhd] or a plain row count — ``2y`` is
      "create aggregator failed" (test_long_window.yaml id 0);
    - ``*_where`` conditions must be <col> <cmp> <const>
      (test_count_where.yaml ids 10/17/18) and the condition column cannot
      be a DATE (test_count_where id 27, test_xxx_where id 27);
    - min/max/sum/avg over BOOL has no pre-agg state (test_udaf.yaml id 7;
      count over bool is fine).
    """
    import re as _re

    from .ast_nodes import BinaryOp, Column, FuncCall, Literal
    from .engine import walk
    from .parser import parse_sql

    case = case or {}
    vparts = str(case.get("__version") or "0").split(".")
    try:
        _ver06 = (int(vparts[0]), int(vparts[1] if len(vparts) > 1 else 0)) \
            >= (0, 6)
    except ValueError:
        _ver06 = False
    lw_names: set[str] = set()
    row_bucket: set[str] = set()
    for part in filter(None,
                       [p.strip() for p in
                        str(case.get("longWindow") or "").split(",")]):
        name, _, size = part.partition(":")
        lw_names.add(name.strip())
        size = size.strip()
        if size and not _re.fullmatch(r"\d+[smhd]?", size):
            raise ValueError(
                f"create aggregator failed: unsupported long-window bucket "
                f"{size!r} (units: s/m/h/d or row count)")
        if size.isdigit():
            row_bucket.add(name.strip())

    for inp in case.get("inputs") or []:
        if isinstance(inp, dict) and str(inp.get("storage") or "").upper() \
                in ("SSD", "HDD"):
            raise ValueError("long window requires a memory table "
                             "(disk tables have no pre-agg; matches "
                             "reference, test_count_where id 30)")

    col_ty: dict[str, str] = {}
    for inp in case.get("inputs") or []:
        if isinstance(inp, dict):
            for cdef in inp.get("columns") or []:
                nm, ty = parse_col_def(str(cdef))
                col_ty.setdefault(nm, ty)

    def _ty(e) -> str | None:
        return col_ty.get(e.name) if isinstance(e, Column) else None

    stmt = parse_sql(sql)
    defined = {w.name for w in (getattr(stmt, "windows", None) or [])}
    for nm in lw_names:
        if nm and defined and nm not in defined:
            raise ValueError(f"long window {nm!r}: no such window in the "
                             "deployed SQL (test_long_window id 9)")
    for it in stmt.items:
        expr = it.expr if hasattr(it, "expr") else it
        for n in walk(expr):
            if not isinstance(n, FuncCall):
                continue
            if lw_names and isinstance(n.over, str) and n.over not in lw_names:
                continue  # not a pre-aggregated window
            fname = n.name.lower()
            if fname.endswith("_where") and isinstance(n.over, str) \
                    and n.over in row_bucket and _ver06:
                # 0.6 dropped row-bucket *_where pre-agg (integration_test/
                # long_window/test_count_where id 29 expects failure; the
                # 0.5 function/ copy of the same SQL expects success)
                raise ValueError(
                    f"long window {n.name}: *_where pre-agg requires a TIME "
                    "bucket, not a row-count bucket (v0.6 semantics)")
            if fname.endswith("_where") and len(n.args) >= 2:
                cond = n.args[1]
                ok = (isinstance(cond, BinaryOp)
                      and cond.op in ("<", "<=", ">", ">=", "=", "!=")
                      and {type(cond.left), type(cond.right)}
                      == {Column, Literal})
                if not ok:
                    raise ValueError(
                        f"long window {n.name}: condition must be "
                        "<col> <cmp> <const> (matches reference pre-agg)")
                if "date" in (_ty(cond.left), _ty(cond.right)):
                    raise ValueError(
                        f"long window {n.name}: DATE filter columns have no "
                        "pre-agg support (matches reference)")
            base = fname[:-6] if fname.endswith("_where") else fname
            if base in ("min", "max", "sum", "avg") and n.args \
                    and _ty(n.args[0]) in ("bool", "boolean"):
                raise ValueError(
                    f"create aggregator failed: {base} over BOOL has no "
                    "long-window pre-agg state (matches reference)")


def _limit_without_order(sql: str) -> bool:
    """True when the query has a LIMIT but no result-level ORDER BY: which
    rows survive is then STORAGE-ITERATION order, which the corpus pins to
    the reference's in-memory skiplist (ts-desc per key) — not meaningful
    for any batch engine (the reference's own Spark offline engine takes
    Spark partition order here too). Such cases compare schema + row count
    only. Depth-0 scan so window-clause ORDER BY (inside parens) doesn't
    count; a LAST JOIN ORDER BY (followed by ON) doesn't either."""
    import re as _re

    low = sql.lower()
    if not _re.search(r"\blimit\s+\d+", low):
        return False
    depth = 0
    for m in _re.finditer(r"[()]|\border\s+by\b", low):
        tok = m.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:
            # join order keys are followed by ON before the next clause
            tail = low[m.end():]
            if not _re.match(r"\s*[\w.`]+\s*(asc|desc)?\s+on\b", tail):
                return False   # a real result ORDER BY -> deterministic
    return True


def _collect_arrow(ds) -> pd.DataFrame:
    """Collect a Dataset as rows WITHOUT the pandas null->NaN collapse:
    returns a DataFrame of object columns where NULL is None and a computed
    float NaN stays nan (the conformance corpus distinguishes them,
    e.g. acos(2) = nan vs empty-window sum = NULL)."""
    import ray

    tbls = [t for t in _arrow_blocks(ds) if t.num_columns > 0]
    if not tbls:
        return pd.DataFrame()
    names = tbls[0].column_names
    data = [[] for _ in names]
    for t in tbls:
        for i in range(len(names)):   # positional: duplicate names allowed
            data[i].extend(t.column(i).to_pylist())
    df = pd.DataFrame({i: pd.Series(vals, dtype=object)
                       for i, vals in enumerate(data)})
    df.columns = names
    return df


def run_file(path: str, only_ids=None) -> list[CaseOutcome]:
    import yaml

    with open(path) as fh:
        doc = yaml.safe_load(fh)
    label = path.split("cases/")[-1]
    out = []
    for case in doc.get("cases") or []:
        if only_ids is not None and case.get("id") not in only_ids:
            continue
        if "db" not in case and doc.get("db"):
            case = {**case, "db": doc["db"]}
        if doc.get("version") is not None:
            case = {**case, "__version": str(doc["version"])}
        out.extend(run_case(case, label))
    return out


def summarize(outcomes: list[CaseOutcome]) -> dict:
    from collections import Counter

    c = Counter(o.status for o in outcomes)
    return dict(c)
