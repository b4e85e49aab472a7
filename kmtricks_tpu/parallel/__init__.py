from kmtricks_tpu.parallel.pipeline import (  # noqa: F401
    build_sharded_pipeline,
    build_single_chip_step,
    make_mesh,
)
