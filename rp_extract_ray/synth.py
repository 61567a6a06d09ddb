"""Deterministic synthetic transcript corpus (FIXTURES.md F1/F2).

Generates the primary input table — multi-turn conversation transcripts with
the authoritative shape from BASELINE.json ``input_hint`` — plus a sparse
``conv_events`` side table for as-of joins. Fully seeded; no external data.

Properties exercised (FIXTURES.md F1/F4):
* heavy-tailed conversation lengths (a few convs 50-100x the median) to
  exercise skew salting;
* ``text`` with variable length, empty strings, UTF-8 multibyte chars,
  embedded newlines / commas / quotes (byte-equal round-trip);
* ``tool`` both empty-string and null;
* ``ts`` monotone non-decreasing per conv, log-normal gaps, occasional
  >=30-min gaps (session boundaries), duplicate-``ts`` pairs (as-of ties);
* conv_events conv_ids are both a subset and superset of transcript convs.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from rp_extract_ray.schema import CONV_EVENT_SCHEMA, TRANSCRIPT_SCHEMA

_ROLES = np.array(["user", "assistant", "tool", "system"])
_TOOLS = np.array(["search", "python", "browser", "calculator", "files"])
_WORDS = np.array(
    [
        "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
        "ray", "data", "arrow", "parquet", "window", "feature", "join",
        "session", "stream", "batch", "tensor", "naïve", "café", "日本語",
        "模型", "émigré", "Zürich", 'say "hi"', "a,b", "x\ny", "§7", "中文",
    ]
)

_EPOCH_US = np.int64(1_700_000_000) * 1_000_000  # 2023-11-14T22:13:20Z


def _make_text(rng: np.random.Generator, n: int, pool_size: int = 50_000) -> list[str]:
    """Deterministic pseudo-text, length 0..~4kB, ~3% empty strings.

    Texts are drawn from a seeded pool (with a per-row numeric suffix so most
    rows stay distinct): building ``pool_size`` strings costs seconds where
    per-row joins cost minutes at bench scale, and duplicate-ish text is
    realistic for transcripts anyway."""
    pool_n = min(pool_size, max(n, 1))
    n_words = rng.geometric(0.02, size=pool_n).clip(1, 600)
    idx = rng.integers(0, len(_WORDS), size=int(n_words.sum()))
    words = _WORDS[idx]
    pool = []
    pos = 0
    for k in n_words:
        pool.append(" ".join(words[pos : pos + k]))
        pos += k
    pick = rng.integers(0, pool_n, size=n)
    suffix = rng.integers(0, 1_000_000, size=n)
    out = [f"{pool[p]} #{s}" for p, s in zip(pick, suffix)]
    empty = rng.random(n) < 0.03
    for i in np.flatnonzero(empty):
        out[i] = ""
    return out


def generate_transcripts(
    n_convs: int = 100, seed: int = 7, mean_turns: int = 24, skew_frac: float = 0.02,
    mega_frac: float = 0.0,
) -> pa.Table:
    """Transcript table with ``n_convs`` conversations; rows are shuffled
    (file order != ts order — the engine must sort, FIXTURES.md F4).

    ``mega_frac > 0`` appends ONE pathological mega-conversation holding that
    fraction of ALL turns (the skew-stress shape: one conversation = 20% of
    the corpus) — the case the salted fused path exists for."""
    rng = np.random.default_rng(seed)
    lens = rng.lognormal(mean=np.log(mean_turns), sigma=0.9, size=n_convs)
    lens = np.maximum(lens.astype(np.int64), 1)
    # heavy tail: a few conversations 50-100x the median
    n_hot = max(1, int(n_convs * skew_frac))
    hot = rng.choice(n_convs, size=n_hot, replace=False)
    lens[hot] = (np.median(lens) * rng.uniform(50, 100, size=n_hot)).astype(np.int64)
    lens[rng.choice(n_convs, size=max(1, n_convs // 50), replace=False)] = 1  # single-turn convs
    names = [f"conv_{i:06d}" for i in range(n_convs)]
    if mega_frac > 0:
        mega_len = int(mega_frac / (1.0 - mega_frac) * lens.sum())
        lens = np.append(lens, np.int64(mega_len))
        names.append("conv_mega")
    total = int(lens.sum())

    conv_id = np.repeat(names, lens)
    turn_idx = np.concatenate([np.arange(l, dtype=np.int32) for l in lens])

    role = _ROLES[(turn_idx % 4 + (rng.random(total) < 0.15) * rng.integers(0, 4, total)) % 4]
    tool_name = _TOOLS[rng.integers(0, len(_TOOLS), total)]
    is_tool = role == "tool"
    # tool column: name for tool rows; else "" or null (both null semantics)
    tool = np.where(is_tool, tool_name, "")
    tool_null_mask = (~is_tool) & (rng.random(total) < 0.5)

    # timestamps: per-conv monotone non-decreasing, lognormal gaps in seconds,
    # ~2% gaps >= 30 min, ~3% zero gaps (duplicate ts within a conv)
    gaps = rng.lognormal(mean=np.log(20.0), sigma=1.2, size=total)
    gaps[rng.random(total) < 0.02] = rng.uniform(1800, 7200)
    gaps[rng.random(total) < 0.03] = 0.0
    gaps[turn_idx == 0] = 0.0
    starts = rng.uniform(0, 90 * 86400, size=len(lens))  # conv start offsets (s)
    gaps_cum = np.cumsum(gaps)
    conv_start_rows = np.concatenate([[0], np.cumsum(lens)[:-1]])
    base = gaps_cum - np.repeat(gaps_cum[conv_start_rows], lens)
    ts_us = _EPOCH_US + ((np.repeat(starts, lens) + base) * 1e6).astype(np.int64)

    text = _make_text(rng, total)

    # permute BEFORE building the Arrow table (out-of-order arrival): a
    # post-hoc table.take overflows 32-bit string offsets past ~2 GB of text
    perm = rng.permutation(total)
    tool_col = np.where(tool_null_mask, None, tool)
    return pa.table(
        {
            "conv_id": pa.array(conv_id[perm], pa.string()),
            "turn_idx": pa.array(turn_idx[perm], pa.int32()),
            "role": pa.array(role[perm], pa.string()),
            "text": pa.array([text[i] for i in perm], pa.string()),
            "tool": pa.array(tool_col[perm], pa.string()),
            "ts": pa.array(ts_us[perm], pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )


def generate_conv_events(
    transcripts: pa.Table, seed: int = 11, events_per_conv: float = 3.0
) -> pa.Table:
    """Sparse irregular event table; conv_ids overlap transcripts both ways
    (semi/anti-join sides), ts both before first and after last turn."""
    rng = np.random.default_rng(seed)
    convs = transcripts.column("conv_id").unique().to_pylist()
    keep = [c for c in convs if rng.random() > 0.2]          # subset
    extra = [f"ghost_{i:04d}" for i in range(max(2, len(convs) // 10))]  # superset
    all_convs = keep + extra
    counts = rng.poisson(events_per_conv, size=len(all_convs)) + 1
    conv_id = np.repeat(all_convs, counts)
    n = len(conv_id)
    ts_us = _EPOCH_US + (rng.uniform(-86400, 120 * 86400, size=n) * 1e6).astype(np.int64)
    return pa.table(
        {
            "conv_id": pa.array(conv_id, pa.string()),
            "ts": pa.array(np.sort(ts_us), pa.timestamp("us")),
            "event_type": pa.array(
                np.array(["rating", "handoff", "flag", "note"])[rng.integers(0, 4, n)]
            ),
            "value": pa.array(np.round(rng.normal(0, 10, size=n), 4), pa.float64()),
        },
        schema=CONV_EVENT_SCHEMA,
    )


def write_corpus(
    out_dir: str,
    n_convs: int = 100,
    seed: int = 7,
    mean_turns: int = 24,
    shards: int = 1,
    mega_frac: float = 0.0,
) -> dict:
    """Write transcripts (``shards`` parquet files) + conv_events under
    ``out_dir``.

    Sharding matters for read parallelism: one giant file caps the read (and
    every fused downstream map) at its row-group count — at 100 TB input is
    always many files, so the bench mirrors that. Idempotent cache: skips
    generation when files already exist (both scaling runs read identical
    bytes).
    """
    os.makedirs(out_dir, exist_ok=True)
    e_path = os.path.join(out_dir, "conv_events.parquet")
    if shards == 1:
        t_path = os.path.join(out_dir, "transcripts.parquet")
        have = os.path.exists(t_path)
    else:
        t_path = os.path.join(out_dir, "transcripts")
        have = os.path.isdir(t_path) and len(os.listdir(t_path)) == shards
    if not (have and os.path.exists(e_path)):
        t = generate_transcripts(
            n_convs=n_convs, seed=seed, mean_turns=mean_turns, mega_frac=mega_frac
        )
        if shards == 1:
            pq.write_table(t, t_path + ".tmp", row_group_size=64 * 1024)
            os.replace(t_path + ".tmp", t_path)
        else:
            os.makedirs(t_path, exist_ok=True)
            n = t.num_rows
            step = -(-n // shards)
            for i in range(shards):
                piece = t.slice(i * step, step)
                p = os.path.join(t_path, f"shard-{i:04d}.parquet")
                pq.write_table(piece, p + ".tmp", row_group_size=32 * 1024)
                os.replace(p + ".tmp", p)
        pq.write_table(generate_conv_events(t, seed=seed + 4), e_path + ".tmp")
        os.replace(e_path + ".tmp", e_path)
    return {"transcripts": t_path, "conv_events": e_path}
