from sota_imagenet_tpu.train import callbacks, checkpoint, loop, metrics, schedule, state, steps
from sota_imagenet_tpu.train.loop import Runner
from sota_imagenet_tpu.train.state import TrainState
