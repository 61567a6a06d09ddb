"""Fault-injection drill: a map task whose WORKER PROCESS dies mid-batch
(os._exit — a real crash, not a Python exception) must be retried by Ray's
task fault tolerance and the pipeline must produce byte-identical results
to an uninjured run. This is the worker-level complement of the
whole-job SIGKILL resume drill (tools/resume_drill.py): at 256-node scale
individual worker losses are routine, and the engine's stages are all
stateless-task or deterministic-exchange shapes, so a retry must be
invisible in the output.
"""

import os
import tempfile

import numpy as np
import pandas as pd

import ray.data as rd


def test_worker_crash_mid_pipeline_retries_to_identical_output():
    from rp_extract_ray.stages.partition import partitioned_apply

    rng = np.random.default_rng(3)
    n = 4000
    pdf = pd.DataFrame(
        {
            "conv_id": rng.integers(0, 40, n).astype(np.int64),
            "turn_idx": np.arange(n, dtype=np.int64),
            "ts": rng.integers(0, 10**6, n)
            .astype("datetime64[s]")
            .astype("datetime64[us]"),
            "value": rng.uniform(0, 100, n),
        }
    )
    flag = os.path.join(
        tempfile.gettempdir(), f"crash_once_{os.getpid()}.flag"
    )
    if os.path.exists(flag):
        os.remove(flag)

    def kernel(g: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        g = g.copy()
        g["cum"] = g.groupby("conv_id")["value"].cumsum()
        return g

    def sabotage(batch: pd.DataFrame) -> pd.DataFrame:
        # first task to claim the flag kills its WORKER (O_EXCL is the
        # atomic claim, so exactly one crash happens per test run)
        try:
            fd = os.open(flag, os.O_CREAT | os.O_EXCL)
            os.close(fd)
            os._exit(1)  # hard worker death, not an exception
        except FileExistsError:
            pass
        return batch

    def run(inject: bool) -> pd.DataFrame:
        ds = rd.from_pandas(pdf).repartition(8)
        if inject:
            ds = ds.map_batches(sabotage, batch_format="pandas")
        out = partitioned_apply(
            ds, kernel, entity_col="conv_id",
            order_cols=("ts", "turn_idx"), num_partitions=8,
        )
        return out.to_pandas().sort_values(
            ["conv_id", "ts", "turn_idx"], ignore_index=True
        )

    clean = run(inject=False)
    injured = run(inject=True)
    assert os.path.exists(flag), "the crash was actually injected"
    os.remove(flag)
    pd.testing.assert_frame_equal(clean, injured)
