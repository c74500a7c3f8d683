from newtonnet_tpu.data.loader import (
    BucketedLoader,
    MolecularDataset,
    MolecularInMemoryDataset,
    MolecularShardedDataset,
    PaddedLoader,
    PrefetchLoader,
    Subset,
    collate,
    parse_npz,
    parse_xyz,
    random_split,
)
from newtonnet_tpu.data.pipeline import parse_train_test
from newtonnet_tpu.data.prelists import (
    NeighborListDataset,
    frame_neighbor_lists,
)
from newtonnet_tpu.data.statistics import compute_statistics, set_scalers
