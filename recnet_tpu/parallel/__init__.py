from recnet_tpu.parallel.mesh import (
    make_mesh, batch_sharding, replicated, state_shardings, shard_state)
