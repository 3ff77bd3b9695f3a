from sr.data.decode import is_image_file, load_img  # noqa: F401
from sr.data.datasets import (  # noqa: F401
    get_training_set,
    get_test_set,
    FolderDataset,
    SyntheticDataset,
)
