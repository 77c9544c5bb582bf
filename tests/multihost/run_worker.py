"""Worker entrypoint for the real 2-process multi-host fit tests.

Launched by tests/unit/parallel/test_true_multihost.py: each process joins
the jax.distributed cluster (CPU backend with gloo cross-host collectives),
fits the same workflow over its partition shard, and writes its fitted
stats to a JSON file for the parent test to compare. Exercises the REAL
multi-process reductions (parallel/multihost.py allgather AND the
parallel/sharded_vocab.py all-to-all vocab exchange) across process
boundaries.
"""

import hashlib
import json
import sys


def main():
    coordinator = sys.argv[1]
    process_id = int(sys.argv[2])
    num_processes = int(sys.argv[3])
    data_dir = sys.argv[4]
    out_file = sys.argv[5]
    case = sys.argv[6] if len(sys.argv) > 6 else "small"

    import jax

    jax.config.update("jax_platforms", "cpu")
    # cross-host collectives (all_to_all) on the CPU backend need gloo
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )

    import numpy as np

    import nvtabular_tpu as nvt
    from nvtabular_tpu import ops

    dataset = nvt.Dataset(data_dir)
    result = {"process": process_id}

    if case == "small":
        cat_op = ops.Categorify(freq_threshold=2)
        norm_op = ops.Normalize()
        wf = nvt.Workflow((["c"] >> cat_op) + (["x"] >> norm_op))
        wf.fit(dataset)  # FitEngine auto-shards by process and reduces states
        vocab = cat_op.vocabs["c"]
        result.update(
            {
                "vocab_values": np.asarray(vocab.values_by_code).tolist(),
                "vocab_counts": np.asarray(vocab.counts).tolist(),
                "mean": norm_op.means["x"],
                "std": norm_op.stds["x"],
                "reduce_paths": getattr(cat_op, "last_fit_reduce", None),
            }
        )
    elif case == "bigvocab":
        # >=1M unique power-law keys: must route through the all-to-all
        # exchange (not the whole-accumulator pickle allgather)
        cat_op = ops.Categorify()
        wf = nvt.Workflow(["c"] >> cat_op)
        wf.fit(dataset)
        vocab = cat_op.vocabs["c"]
        values = np.ascontiguousarray(np.asarray(vocab.values_by_code))
        counts = np.ascontiguousarray(np.asarray(vocab.counts, dtype=np.int64))
        result.update(
            {
                "n_vocab": int(len(values)),
                "values_dtype": str(values.dtype),
                "values_sha": hashlib.sha256(values.tobytes()).hexdigest(),
                "counts_sha": hashlib.sha256(counts.tobytes()).hexdigest(),
                "head_values": values[:20].tolist(),
                "reduce_paths": getattr(cat_op, "last_fit_reduce", None),
            }
        )
    elif case == "te_groupby":
        # >=100K-group k-fold TE + multi-key JoinGroupby: the keyed-stats
        # state must reduce through the all-to-all row exchange
        # (ops/groupby_stats.py reduce_accums_multihost), matching the
        # single-process fit bit-for-bit (int-valued targets sum exactly)
        te_op = ops.TargetEncoding("label", kfold=3, p_smooth=10)
        jg_op = ops.JoinGroupby(cont_cols=["y"], stats=["sum", "count", "mean"])
        wf = nvt.Workflow((["c"] >> te_op) + ([["c", "d"]] >> jg_op))
        wf.fit(dataset)
        keyed = te_op.fold_stats["c"]
        jk = jg_op.keyed["c_d"]

        def sha(arr):
            return hashlib.sha256(np.ascontiguousarray(arr).tobytes()).hexdigest()

        result.update(
            {
                "te_groups": int(keyed.num_groups),
                "te_keys_sha": sha(np.asarray(keyed.key_arrays["c"])),
                "te_sum_sha": sha(np.asarray(keyed.stats["label.sum"])),
                "te_cnt_sha": sha(np.asarray(keyed.stats["label.count"])),
                "te_mean": te_op.means["label"],
                "jg_groups": int(jk.num_groups),
                "jg_sum_sha": sha(np.asarray(jk.stats["y.sum"])),
                "jg_mean_sha": sha(np.asarray(jk.stats["y.mean"])),
                "te_reduce": getattr(te_op, "last_fit_reduce", None),
                "jg_reduce": getattr(jg_op, "last_fit_reduce", None),
            }
        )
    elif case == "strvocab":
        # large STRING vocabulary: must reduce through the byte-lane
        # all-to-all (exchange_partial_string_counts), not the
        # whole-accumulator pickle allgather
        cat_op = ops.Categorify()
        wf = nvt.Workflow(["s"] >> cat_op)
        wf.fit(dataset)
        vocab = cat_op.vocabs["s"]
        values = np.asarray(vocab.values_by_code)
        blob = "\x00".join(str(v) for v in values).encode()
        counts = np.ascontiguousarray(np.asarray(vocab.counts, dtype=np.int64))
        result.update(
            {
                "n_vocab": int(len(values)),
                "values_sha": hashlib.sha256(blob).hexdigest(),
                "counts_sha": hashlib.sha256(counts.tobytes()).hexdigest(),
                "head_values": values[:10].tolist(),
                "reduce_paths": getattr(cat_op, "last_fit_reduce", None),
            }
        )
    else:
        raise SystemExit(f"unknown case {case!r}")

    with open(out_file, "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
