"""Model core: the FragNet layer/encoder family, heads, finetune/pretrain
wrappers — pure-functional flax.linen re-design of fragnet/model/gat/*."""

from fragnet_tpu.model.layers import FragNetLayer, LayerHooks
from fragnet_tpu.model.fragnet import FragNet
from fragnet_tpu.model.heads import (
    FTHead1,
    FTHead2,
    FTHead3,
    FTHead4,
    FTHead5,
    PretrainTask,
)
from fragnet_tpu.model.finetune import FragNetFineTune, FragNetFineTuneBase
from fragnet_tpu.model.pretrain import FragNetPreTrain

__all__ = [
    "FragNetLayer",
    "LayerHooks",
    "FragNet",
    "FTHead1",
    "FTHead2",
    "FTHead3",
    "FTHead4",
    "FTHead5",
    "PretrainTask",
    "FragNetFineTune",
    "FragNetFineTuneBase",
    "FragNetPreTrain",
]
