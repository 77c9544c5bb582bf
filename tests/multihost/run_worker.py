"""Worker entrypoint for the real 2-process multi-host fit test.

Launched by tests/unit/parallel/test_true_multihost.py: each process joins
the jax.distributed cluster (CPU backend), fits the same workflow over its
partition shard, and writes its fitted stats to a JSON file for the parent
test to compare. Exercises the REAL allgather merge path
(parallel/multihost.py) across process boundaries.
"""

import json
import os
import sys


def main():
    coordinator = sys.argv[1]
    process_id = int(sys.argv[2])
    num_processes = int(sys.argv[3])
    data_dir = sys.argv[4]
    out_file = sys.argv[5]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )

    import numpy as np

    import nvtabular_tpu as nvt
    from nvtabular_tpu import ops

    dataset = nvt.Dataset(data_dir)
    cat_op = ops.Categorify(freq_threshold=2)
    norm_op = ops.Normalize()
    wf = nvt.Workflow((["c"] >> cat_op) + (["x"] >> norm_op))
    wf.fit(dataset)  # FitEngine auto-shards by process and allgathers states

    vocab = cat_op.vocabs["c"]
    result = {
        "process": process_id,
        "vocab_values": np.asarray(vocab.values_by_code).tolist(),
        "vocab_counts": np.asarray(vocab.counts).tolist(),
        "mean": norm_op.means["x"],
        "std": norm_op.stds["x"],
    }
    with open(out_file, "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
