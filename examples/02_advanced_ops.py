"""Advanced feature engineering: target encoding, per-group aggregates,
custom lambdas, bucketization, list slicing.

Script analog of the reference's 02-Advanced-NVTabular-workflow notebook:
the "advanced MovieLens" configuration (BASELINE.md config 2).

Run: python examples/02_advanced_ops.py
"""

import numpy as np
import pandas as pd

import nvtabular_tpu as nvt
from nvtabular_tpu import ops


def main():
    rng = np.random.default_rng(11)
    import os
    n = int(os.environ.get('NVT_EXAMPLE_ROWS', 100_000))
    df = pd.DataFrame(
        {
            "userId": rng.choice(rng.integers(0, 1 << 30, 2000), n).astype(np.int64),
            "movieId": rng.integers(0, 3000, n).astype(np.int64),
            "age_days": rng.uniform(1, 1000, n).astype(np.float32),
            "price": rng.lognormal(2.0, 1.0, n).astype(np.float32),
            "rating": rng.integers(0, 2, n).astype(np.int64),
        }
    )
    df["genres"] = [list(rng.integers(0, 20, rng.integers(1, 6))) for _ in range(n)]
    dataset = nvt.Dataset(df, part_size=8 * 1024 * 1024)

    # out-of-fold smoothed target statistics per user
    te = ["userId"] >> ops.TargetEncoding(["rating"], kfold=5, p_smooth=20)
    # per-movie mean/std price broadcast back onto rows
    jg = ["movieId"] >> ops.JoinGroupby(cont_cols=["price"], stats=["mean", "std"])
    # custom transform via named function (serializable, unlike lambdas)
    log_price = ["price"] >> ops.LambdaOp(np.log1p, dtype=np.float32)
    # quantile-ish manual buckets
    buckets = ["age_days"] >> ops.Bucketize({"age_days": [30, 90, 180, 365]})
    # truncate genre lists to the 3 most recent, padded
    genres = ["genres"] >> ops.Categorify() >> ops.ListSlice(0, 3, pad=True)
    cats = ["userId", "movieId"] >> ops.Categorify(freq_threshold=2)

    workflow = nvt.Workflow(te + jg + log_price + buckets + genres + cats + ["rating"])
    out = workflow.fit_transform(dataset).to_table().to_pandas()
    print(out.head())
    print("\ncolumns:", list(out.columns))
    te_col = [c for c in out.columns if c.startswith("TE_")][0]
    print(f"\n{te_col}: mean={out[te_col].mean():.4f} (≈ global rating mean "
          f"{df['rating'].mean():.4f} pulled by smoothing)")


if __name__ == "__main__":
    main()
