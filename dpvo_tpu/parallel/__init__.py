from dpvo_tpu.parallel.dist_ba import dist_ba_delta  # noqa: F401
from dpvo_tpu.parallel.shard import (  # noqa: F401
    data_sharding,
    edge_shard,
    make_mesh,
    mesh_context,
    replicated,
)
