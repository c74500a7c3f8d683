from newtonnet_tpu.parallel.mesh import make_mesh
from newtonnet_tpu.parallel.graph_parallel import (
    make_sharded_energy_force_fn,
    pad_atoms_to_multiple,
)
from newtonnet_tpu.parallel.distributed import (
    global_data_batch,
    initialize_distributed,
    is_multiprocess,
    make_global_mesh,
    maybe_initialize_from_env,
    process_local_batch_slice,
)
from newtonnet_tpu.parallel.halo import (
    check_halo_capacity,
    exchange_halo,
    make_halo_energy_force_fn,
    make_halo_train_step,
    shard_halo_batch,
    spatial_sort,
)
