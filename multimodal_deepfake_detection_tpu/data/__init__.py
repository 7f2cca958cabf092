from .datasets import NpyFolderDataset, label_from_filename
from .collate import pad_collate, bucket_length
from .loader import DataLoader, make_weighted_sampler
from .synthetic import make_face_npy_tree, make_audio_npy_tree, make_au_patch_tree, make_joint_tree
from .au_patches import (
    AUPatchDataset,
    JointAUVideoDataset,
    get_patch_image_loaders,
    get_joint_dataloader,
)
from .video_enhanced import EnhancedVideoDataset, get_face_dataloader
