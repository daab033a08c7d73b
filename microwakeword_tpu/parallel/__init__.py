"""Device-mesh parallelism: data-parallel training and pod-scale sweeps."""

from microwakeword_tpu.parallel.mesh import auto_mesh, create_mesh  # noqa: F401
from microwakeword_tpu.parallel.train_step import (  # noqa: F401
    make_sharded_train_step,
    replicate,
)
