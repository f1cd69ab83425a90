from sota_imagenet_tpu.data.pipeline import DataManager, DeviceFeed, FolderLoader, SyntheticLoader, build_loader
