from efficient_tts_tpu.parallel.mesh import make_mesh  # noqa: F401
from efficient_tts_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    param_sharding,
    param_specs,
)
