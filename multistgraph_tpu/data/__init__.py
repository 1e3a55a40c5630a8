from multistgraph_tpu.data.dataset import (
    DATASET_REGISTRY,
    MTHDataset,
    TrafficStateDataset,
    TrafficStatePointDataset,
    get_dataset,
)
from multistgraph_tpu.data.loader import DeviceDataLoader, generate_dataloaders

__all__ = [
    "DATASET_REGISTRY",
    "MTHDataset",
    "TrafficStateDataset",
    "TrafficStatePointDataset",
    "get_dataset",
    "DeviceDataLoader",
    "generate_dataloaders",
]
