"""Schemas and engine-wide constants.

Design decision (SURVEY.md §1.3 / §7.5-8): the engine is *schema-first*. The
reference infers its HDF5 vector schema from the first extracted record
(/root/reference/rp_feature_io.py:146-196), a race under parallelism; here every
table schema is declared up front as an explicit ``pyarrow.Schema`` and feature
vector layouts are documented in schema metadata (the reference's
Fortran-flatten lesson, /root/reference/rp_extract.py:451).
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Primary input table (authoritative shape from BASELINE.json input_hint)
# ---------------------------------------------------------------------------
TRANSCRIPT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

# Right side for as-of joins (FIXTURES.md F2; analogue of the reference label
# table, /root/reference/classes_io.py:22-110).
CONV_EVENT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("ts", pa.timestamp("us")),
        pa.field("event_type", pa.string()),
        pa.field("value", pa.float64()),
    ]
)

# ---------------------------------------------------------------------------
# Statistical feature layout
# ---------------------------------------------------------------------------
# The 7-stat summary kernel of the reference (calc_statistical_features,
# /root/reference/rp_extract.py:218-232): mean, population variance, population
# skew, PEARSON kurtosis (fisher=False), median, min, max — NaN -> 0.
STAT_NAMES = ("mean", "var", "skew", "kurt", "median", "min", "max")
N_STATS = len(STAT_NAMES)

# Per-turn numeric series tracked by the windowed feature stages — the
# transcript analogue of PCM samples (/root/reference/rp_extract.py:380
# `wavedata`). Order is load-bearing: feature vectors are flattened
# series-major (series varies slowest), documented here instead of the
# reference's implicit Fortran order.
TRACKED_SERIES = ("text_len", "token_est", "gap_s")

# Windowing defaults (analogue of segment_size / step_width,
# /root/reference/rp_extract.py:455-466,493-505).
DEFAULT_WINDOW_TURNS = 16          # sliding window length (turns) for SSD-analogue
DEFAULT_SEGMENT_TURNS = 64         # tumbling/strided segment for rhythm features
DEFAULT_SKIP_LEADIN_FADEOUT = 1    # segments skipped at each end (long convs)
DEFAULT_STEP_WIDTH = 1             # stride multiplier between segments
N_MOD_FREQ = 60                    # modulation-frequency bins kept (DC excluded),
                                   # mirrors mod_ampl_limit=60 (/root/reference/rp_extract.py:449)

# Inactivity gap that opens a new session (FIXTURES.md F1: >=30-min gaps are
# session boundaries).
DEFAULT_SESSION_GAP_S = 30 * 60.0

# Partitioning defaults. One partition = a set of WHOLE conversations
# (SURVEY.md §7.5-1); conversations larger than SALT_THRESHOLD_TURNS take the
# salted overlap-chunk path (stages/partition.py).
DEFAULT_NUM_PARTITIONS = 64


def feature_field(name: str, dim: int) -> pa.Field:
    """Fixed-size float64 vector column with its layout recorded in metadata."""
    return pa.field(
        name,
        pa.list_(pa.float64(), dim),
        metadata={b"layout": b"series-major; see rp_extract_ray.schema"},
    )
