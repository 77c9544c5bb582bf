"""Getting started: MovieLens-style Categorify + Normalize workflow.

Script analog of the reference's 01-Getting-started notebook
(reference examples/01-Getting-started.ipynb): synthesize a ratings
dataset, build a feature-engineering workflow, fit + transform, persist the
fitted workflow, and reload it for serving.

Run: python examples/01_getting_started.py
"""

import os
import tempfile

import numpy as np

import nvtabular_tpu as nvt
from nvtabular_tpu import ops
from nvtabular_tpu.tools import CatCol, ContCol, DatasetGen, LabelCol, PowerLawDistro


def main():
    workdir = tempfile.mkdtemp(prefix="nvt_tpu_example_")

    # 1. synthesize a MovieLens-like dataset (userId/movieId skewed power-law)
    gen = DatasetGen(PowerLawDistro(0.1), seed=7)
    cols = {
        "cats": [
            CatCol("userId", np.int64, cardinality=10_000),
            CatCol("movieId", np.int64, cardinality=5_000),
            CatCol("genres", np.int64, cardinality=20, multi_min=1, multi_max=4),
        ],
        "conts": [ContCol("age_days", np.float32, 1, 1000, per_nan=0.02)],
        "labels": [LabelCol("rating", np.int64, 2)],
    }
    data_dir = os.path.join(workdir, "data")
    gen.full_df_create(int(os.environ.get('NVT_EXAMPLE_ROWS', 200_000)), cols, output=data_dir, files_per_output=4)
    dataset = nvt.Dataset(data_dir)
    print("dataset:", dataset)

    # 2. build the workflow with the >> DSL
    cats = ["userId", "movieId", "genres"] >> ops.Categorify(freq_threshold=2)
    conts = ["age_days"] >> ops.FillMissing() >> ops.LogOp() >> ops.Normalize()
    label = ["rating"] >> ops.AddTags([nvt.Tags.TARGET])
    workflow = nvt.Workflow(cats + conts + label)

    # 3. fit + transform
    transformed = workflow.fit_transform(dataset)
    out_dir = os.path.join(workdir, "transformed")
    transformed.to_parquet(out_dir, out_files_per_proc=2)
    print("output schema:")
    for cs in workflow.output_schema:
        emb = cs.properties.get("embedding_sizes")
        print(f"  {cs.name:10s} {cs.dtype.name:8s} tags={sorted(t.value for t in cs.tags)}"
              + (f" embedding={emb}" if emb else ""))

    # 4. persist + reload (serving path)
    wf_dir = os.path.join(workdir, "workflow")
    workflow.save(wf_dir)
    restored = nvt.Workflow.load(wf_dir)
    sample = dataset.head(5)
    served = restored.transform(sample)  # pandas in → pandas out
    print("served sample:\n", served)
    print("embedding sizes:", ops.get_embedding_sizes(restored))


if __name__ == "__main__":
    main()
