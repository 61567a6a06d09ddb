"""Id-normalization string kernels (M26 tail).

Re-derivation of the reference's filename-id helpers: ``strip_filenames``
(/root/reference/classes_io.py:546-558: cut path, cut extension) and
``classes_from_filename`` (/root/reference/classes_io.py:175-205: class =
prefix before the first separator, with the all-unique sanity check and the
cross-platform separator fallback). Vectorized with pyarrow.compute regex
kernels — no per-id Python loop — so the same functions serve both the
small label-table paths and in-pipeline ``map_batches`` normalization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def strip_ids(
    ids,
    *,
    cut_path: bool = True,
    cut_ext: bool = True,
    lower: bool = False,
) -> pa.Array:
    """Normalize an array of string ids the way the reference strips
    filenames: drop any leading path, drop the trailing extension,
    optionally lowercase. Accepts a pyarrow array/chunked array, numpy
    array, or list; returns a pyarrow string array."""
    arr = ids if isinstance(ids, (pa.Array, pa.ChunkedArray)) else pa.array(
        np.asarray(ids, dtype=object), pa.string()
    )
    if cut_path:
        arr = pc.replace_substring_regex(arr, r"^.*[/\\]", "")
    if cut_ext:
        # basename extension only: final dot followed by no further dot/sep
        arr = pc.replace_substring_regex(arr, r"\.[^./\\]*$", "")
    if lower:
        arr = pc.utf8_lower(arr)
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


def classes_from_ids(ids, split_char: str | None = None) -> np.ndarray:
    """Class label = prefix before the FIRST ``split_char`` of each id
    (reference: 'pop/file1.wav' -> 'pop'; GTZAN 'pop.00001.wav' with '.').

    ``split_char=None`` picks '/' unless the first id contains none and a
    '\\' instead (the reference's cross-platform fallback). Raises when the
    derived labels are all unique — then the ids carry no class structure
    and a label file is required (reference sanity check)."""
    arr = np.asarray(
        ids.to_pylist() if isinstance(ids, (pa.Array, pa.ChunkedArray)) else ids,
        dtype=object,
    )
    if len(arr) == 0:
        return np.empty(0, dtype=object)
    if split_char is None:
        split_char = "/"
        if "/" not in arr[0] and "\\" in arr[0]:
            split_char = "\\"
    labels = np.array([s.split(split_char, 1)[0] for s in arr], dtype=object)
    if len(set(labels.tolist())) == len(arr):
        raise ValueError(
            "class label could not be derived from ids: every derived label "
            "is unique; provide a class label file instead"
        )
    return labels
