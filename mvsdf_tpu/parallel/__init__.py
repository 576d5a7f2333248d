from .mesh import make_mesh, DATA_AXIS
from .sharding import (batch_shardings, replicated, ray_sharded,
                       device_put_batch)
