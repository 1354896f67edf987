from dream_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    param_shardings,
    shard_params,
    initialize_distributed,
    process_local_batch,
)
from dream_tpu.parallel.pipeline import (
    make_pipeline_mesh,
    pipeline_multistage_inference,
)
