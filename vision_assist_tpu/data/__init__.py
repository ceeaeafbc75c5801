from vision_assist_tpu.data.dataset import SegDataset, parse_label_file
from vision_assist_tpu.data.loader import BatchLoader

__all__ = ["SegDataset", "parse_label_file", "BatchLoader"]
