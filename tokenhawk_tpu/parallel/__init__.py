from tokenhawk_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    single_device_mesh,
)
from tokenhawk_tpu.parallel.sharding import (  # noqa: F401
    kv_cache_spec,
    param_specs,
    shard_kv_cache,
    shard_params,
)
