"""Host data pipeline: datasets, augmentation, synthetic generation,
threaded loading + device prefetch."""

from loans_tpu.data.datasets import (
    DiscriminatorImageDataset,
    ImageDataset,
    LabeledImageDataset,
    load_image,
    read_bbox_json,
    read_labeled_csv,
    read_path_list,
    resize_bbox,
    resize_image,
)
from loans_tpu.data.device_data import (
    DevicePool,
    device_chunk_batches,
    device_eval_batches,
    materialize,
    pool_nbytes,
)
from loans_tpu.data.loader import (
    DataLoader,
    default_collate,
    device_prefetch,
    padded_collate,
)
from loans_tpu.data.synthetic import (
    PasteAndCropGenerator,
    SyntheticAssessorDataset,
    SyntheticLocalizerDataset,
    generate_dataset,
)

__all__ = [
    "DiscriminatorImageDataset",
    "ImageDataset",
    "LabeledImageDataset",
    "load_image",
    "read_bbox_json",
    "read_labeled_csv",
    "read_path_list",
    "resize_bbox",
    "resize_image",
    "DevicePool",
    "device_chunk_batches",
    "device_eval_batches",
    "materialize",
    "pool_nbytes",
    "DataLoader",
    "default_collate",
    "device_prefetch",
    "padded_collate",
    "PasteAndCropGenerator",
    "SyntheticAssessorDataset",
    "SyntheticLocalizerDataset",
    "generate_dataset",
]
