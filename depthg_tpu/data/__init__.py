from depthg_tpu.data.transforms import (
    get_transform,
    normalize_array,
    unnormalize,
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from depthg_tpu.data.datasets import (
    DirectoryDataset,
    Potsdam,
    PotsdamRaw,
    Coco,
    CityscapesSeg,
    NYUv2,
    PascalVOC,
    CroppedDataset,
    MaterializedDataset,
    create_pascal_label_colormap,
    create_cityscapes_colormap,
)
from depthg_tpu.data.contrastive import ContrastiveSegDataset
from depthg_tpu.data.loader import DataLoader
