from newtonnet_tpu.parallel.mesh import make_mesh
from newtonnet_tpu.parallel.graph_parallel import (
    make_sharded_energy_force_fn,
    pad_atoms_to_multiple,
)
from newtonnet_tpu.parallel.distributed import (
    initialize_distributed,
    make_global_mesh,
    process_local_batch_slice,
)
