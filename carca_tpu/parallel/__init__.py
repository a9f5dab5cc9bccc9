"""Parallelism: device meshes, sharded train/eval steps, sharded tables.

The reference is strictly single-device (SURVEY.md §2.3 — no DDP/NCCL/MPI
anywhere); this package is the TPU-native distributed layer built in its
place, per the north-star configs:

* **Data parallel** — batch dim sharded over the ``data`` mesh axis via
  ``jit`` + ``NamedSharding``; XLA inserts the gradient ``psum`` over ICI.
* **Row-sharded embedding tables** — item/attribute tables sharded over the
  ``model`` axis; lookups run as a ``shard_map`` local-gather + ``psum``
  (each chip holds 1/N of the catalog and contributes masked rows), so the
  10M-item catalog config never replicates tables.
* **On-device negative sampling** — per-step uniform rejection sampling with
  the JAX PRNG so the input pipeline stays off the host at scale.
* Pipeline parallel and expert parallel are intentionally out of scope for
  2-block models (SURVEY.md §2.3); the mesh plumbing accepts extra axes.

Multi-host: call :func:`carca_tpu.parallel.mesh.initialize_distributed`
before building the mesh; everything else is expressed over the global mesh
and works unchanged from 1 chip to a pod slice.
"""

from carca_tpu.parallel.mesh import (  # noqa: F401
    initialize_distributed,
    make_mesh,
    param_shardings,
    shard_batch,
)
from carca_tpu.parallel.embedding import make_sharded_lookup  # noqa: F401
from carca_tpu.parallel.step import (  # noqa: F401
    make_sharded_eval_step,
    make_sharded_train_step,
)
from carca_tpu.parallel.sampling import device_sample_negatives  # noqa: F401
from carca_tpu.parallel.retrieval import (  # noqa: F401
    embed_catalog,
    full_catalog_topk,
    retrieval_hr_ndcg,
    topk_given_queries,
    topk_given_queries_sharded,
)
