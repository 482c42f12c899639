"""Paragraph-level cross-corpus deduplication (the CCNet / RefinedWeb
line-dedup shape: Wenzek et al. 2020 §3.2).

Web boilerplate (nav bars, cookie banners, license footers) repeats the
same PARAGRAPH across millions of documents; document-level dedup never
sees it. This stage splits every document on ``sep``, keeps only the
globally FIRST occurrence of each distinct paragraph (first in
``(id, position)`` order — deterministic under any partitioning), and
reassembles documents from their surviving paragraphs. Paragraphs shorter
than ``min_chars`` are exempt (never deduped, always kept): dedup of ""
or "." would shred unrelated documents.

Scale shape (the whole point — text never rides the wide exchange):
1. EXPLODE: one streaming ``map_batches`` pass emits one NARROW row per
   dedupable paragraph occurrence — ``(id, position, h1, h2)`` where
   (h1, h2) is a 128-bit content hash (two independent SipHash-1-3 keys;
   at 10^12 paragraphs the 64-bit birthday bound is ~50% collision, the
   128-bit bound is ~1e-15). Paragraph TEXT stays in the source blocks.
2. DECIDE: the narrow rows shuffle ONCE on a coarse bucket of h1; each
   bucket lexsorts (h1, h2, id, pos) and emits only the NON-first
   occurrences — the DROP set, the small side (boilerplate dups), never
   the keep set (≈ the corpus).
3. APPLY: the drop set flows back to the documents either broadcast
   (``ray.put`` once, shuffle-free filter pass — the default when it
   fits ``broadcast_limit``) or via one id-bucketed co-shuffle.
   Untouched documents (the common case) pass through without any
   string work.

Reference analog: OpenMLDB has no corpus-dedup surface; its DISTINCT
(PhysicalDistinctNode, plan/plan_api_test.cc usage) is whole-row. This is
the training-data extension the survey calls for.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import itertools

import numpy as np
import pandas as pd
from ..config import broadcast_limit as _cfg_broadcast_limit

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

_H2_KEY = "omr-paradedup-2a"  # second independent 16-byte SipHash key


def _split_counts(texts: pd.Series, sep: str):
    """Vectorized split: flat object ndarray of paragraphs + per-doc
    counts. ``str.split`` is the pandas C loop; the flatten is one
    C-speed ``fromiter`` over ``chain`` (no per-row Python append)."""
    parts = texts.fillna("").astype(str).str.split(sep)
    counts = parts.str.len().to_numpy(np.int64)
    flat = np.fromiter(itertools.chain.from_iterable(parts),
                       dtype=object, count=int(counts.sum()))
    return flat, counts


def _explode_fn(text_col: str, id_col: str, sep: str, min_chars: int):
    def explode(df: pd.DataFrame) -> pd.DataFrame:
        from ..core.hashing import quiet_ray_data_logs, stable_hash64

        quiet_ray_data_logs()
        flat, counts = _split_counts(df[text_col], sep)
        ids = np.repeat(df[id_col].to_numpy(), counts)
        total = len(flat)
        starts = np.cumsum(counts) - counts
        pos = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
        lens = pd.Series(flat).str.len().to_numpy(np.int64)
        m = lens >= min_chars
        flat, ids, pos = flat[m], ids[m], pos[m]
        h1 = stable_hash64(flat)
        h2 = pd.util.hash_array(flat, hash_key=_H2_KEY, categorize=True)
        return pd.DataFrame({"__pid": ids, "__pos": pos,
                             "__h1": h1, "__h2": h2})
    return explode


def _emit_drops(g: pd.DataFrame) -> pd.DataFrame:
    """Within one h1-bucket: lexsort (h1, h2, id, pos); every occurrence
    after the first of its (h1, h2) group is a drop."""
    from ..core.hashing import quiet_ray_data_logs

    quiet_ray_data_logs()
    h1 = g["__h1"].to_numpy()
    h2 = g["__h2"].to_numpy()
    order = np.lexsort((g["__pos"].to_numpy(), g["__pid"].to_numpy(),
                        h2, h1))
    h1s, h2s = h1[order], h2[order]
    dup = np.zeros(len(order), dtype=bool)
    dup[1:] = (h1s[1:] == h1s[:-1]) & (h2s[1:] == h2s[:-1])
    sel = order[dup]
    return pd.DataFrame({"__pid": g["__pid"].to_numpy()[sel],
                         "__pos": g["__pos"].to_numpy()[sel]})


def _apply_drops(df: pd.DataFrame, dropset, text_col: str,
                 id_col: str, sep: str) -> pd.DataFrame:
    """Rewrite ``text_col`` for the (few) documents with dropped
    paragraphs; everything else passes through byte-identical.
    ``dropset`` is the ``(keys ndarray, {id: positions})`` pair from
    :func:`_drops_to_map` — membership is one vectorized ``np.isin``."""
    keys, dropmap = dropset
    if len(keys) == 0:
        return df
    ids = df[id_col].to_numpy()
    hit = np.isin(ids, keys)
    if not hit.any():
        return df
    df = df.copy()
    texts = df[text_col].to_numpy(dtype=object)
    for row in np.flatnonzero(hit):
        paras = np.array(texts[row].split(sep), dtype=object)
        keep = np.ones(len(paras), dtype=bool)
        drop_pos = dropmap[ids[row]]
        keep[drop_pos[drop_pos < len(paras)]] = False
        texts[row] = sep.join(paras[keep].tolist())
    df[text_col] = texts
    return df


def _drops_to_map(pid: np.ndarray, pos: np.ndarray):
    """(id, pos) pairs → ``(distinct ids ndarray, {id: positions})``
    without a Python pair loop: one lexsort + split at id boundaries."""
    if len(pid) == 0:
        return pid, {}
    order = np.lexsort((pos, pid))
    pid, pos = pid[order], pos[order]
    bounds = np.flatnonzero(pid[1:] != pid[:-1]) + 1
    firsts = pid[np.concatenate(([0], bounds))]
    chunks = np.split(pos, bounds)
    return firsts, dict(zip(firsts.tolist(), chunks))


def paragraph_dedup(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    sep: str = "\n",
    min_chars: int = 1,
    drop_empty: bool = True,
    strategy: str = "auto",
    broadcast_limit: int | None = None,
    num_buckets: int | None = None,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Corpus-wide paragraph dedup; returns ``ds`` with ``text_col``
    rewritten (all other columns pass through untouched — derived stats
    like char counts go stale by design; recompute downstream if needed).
    ``drop_empty`` removes documents whose surviving text is whitespace.
    ``id_col`` values must be unique and hashable."""
    import ray

    from ..core.grouping import map_groups_typed
    from ..core.hashing import default_num_buckets

    nb = num_buckets or default_num_buckets()
    narrow = ds.select_columns([id_col, text_col]).map_batches(
        _explode_fn(text_col, id_col, sep, min_chars),
        batch_format="pandas", batch_size=None)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__pb"] = (df["__h1"].to_numpy() % np.uint64(nb)).astype(np.int64)
        return df

    drops = map_groups_typed(
        narrow.map_batches(add_bucket, batch_format="pandas",
                           batch_size=None),
        "__pb", _emit_drops, num_partitions=num_partitions).materialize()
    n_drop = drops.count()  # metadata read — executed once above

    if strategy == "auto":
        strategy = ("broadcast"
                    if n_drop <= _cfg_broadcast_limit(broadcast_limit, 5_000_000)
                    else "shuffle")

    if strategy == "broadcast":
        if n_drop == 0:
            out = ds
        else:
            pids, poss = [], []
            for b in drops.iter_batches(batch_format="pandas"):
                pids.append(b["__pid"].to_numpy())
                poss.append(b["__pos"].to_numpy())
            dref = ray.put(_drops_to_map(np.concatenate(pids),
                                         np.concatenate(poss)))

            def apply_b(df: pd.DataFrame) -> pd.DataFrame:
                from ..core.hashing import quiet_ray_data_logs

                quiet_ray_data_logs()
                return _apply_drops(df, ray.get(dref), text_col, id_col, sep)

            out = ds.map_batches(apply_b, batch_format="pandas",
                                 batch_size=None)
    elif strategy == "shuffle":
        # one id-bucketed co-shuffle: docs (role 0) + drops (role 1)
        import pyarrow as pa

        from ..core.empty_ds import union_any
        from ..core.hashing import add_bucket_column

        ds_a = ds.map_batches(lambda t: t, batch_format="pyarrow",
                              batch_size=None)
        schema = ds_a.schema()
        names, types = list(schema.names), list(schema.types)

        def pad_drop(t: pa.Table) -> pa.Table:
            arrays = []
            for name, typ in zip(names, types):
                if name == id_col:
                    import pyarrow.compute as pc

                    arrays.append(pc.cast(t["__pid"], typ).combine_chunks())
                else:
                    arrays.append(pa.nulls(t.num_rows, typ))
            out = pa.Table.from_arrays(arrays, names=names)
            return out.append_column(
                "__pos", pa.array(t["__pos"].to_numpy(
                    zero_copy_only=False).astype(np.int64)))

        def mark(t: pa.Table) -> pa.Table:
            t = t.select(names).replace_schema_metadata(None)
            return t.append_column(
                "__pos", pa.array(np.full(t.num_rows, -1, np.int64)))

        add_b = add_bucket_column([id_col], "__db", nb)
        left = ds_a.map_batches(mark, batch_format="pyarrow",
                                batch_size=None) \
                   .map_batches(add_b, batch_format="pyarrow",
                                batch_size=None)
        right = drops.map_batches(pad_drop, batch_format="pyarrow",
                                  batch_size=None) \
                     .map_batches(add_b, batch_format="pyarrow",
                                  batch_size=None)

        def apply_s(g: pd.DataFrame) -> pd.DataFrame:
            from ..core.hashing import quiet_ray_data_logs

            quiet_ray_data_logs()
            isdrop = g["__pos"].to_numpy() >= 0
            dmap = _drops_to_map(g.loc[isdrop, id_col].to_numpy(),
                                 g.loc[isdrop, "__pos"].to_numpy(np.int64))
            docs = g.loc[~isdrop].drop(columns=["__pos", "__db"])
            return _apply_drops(docs, dmap, text_col, id_col, sep)

        out = map_groups_typed(union_any(left, right), "__db", apply_s,
                               num_partitions=num_partitions)
    else:
        raise ValueError(f"unknown strategy {strategy!r}")

    if drop_empty:
        def nonempty(df: pd.DataFrame) -> pd.DataFrame:
            return df[df[text_col].astype(str).str.strip() != ""]

        out = out.map_batches(nonempty, batch_format="pandas",
                              batch_size=None)
    return out
