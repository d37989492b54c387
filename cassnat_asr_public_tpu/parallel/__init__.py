from cassnat_asr_public_tpu.parallel.mesh import (
    batch_sharding,
    distributed_init,
    make_mesh,
    param_sharding_rules,
    replicated,
    shard_batch,
)
