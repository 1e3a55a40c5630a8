from multistgraph_tpu.data.dataset import (
    DATASET_REGISTRY,
    MTHDataset,
    TrafficStateDataset,
    TrafficStatePointDataset,
    get_dataset,
)
from multistgraph_tpu.data.loader import (
    DeviceDataLoader,
    generate_dataloaders,
    pad_ragged,
)

__all__ = [
    "pad_ragged",
    "DATASET_REGISTRY",
    "MTHDataset",
    "TrafficStateDataset",
    "TrafficStatePointDataset",
    "get_dataset",
    "DeviceDataLoader",
    "generate_dataloaders",
]
