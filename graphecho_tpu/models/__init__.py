from graphecho_tpu.models.backbones import VGG16, ResNet, ResNet50, ResNet101
from graphecho_tpu.models.fpn import FPN
from graphecho_tpu.models.discriminator import Discriminator

__all__ = ["VGG16", "ResNet", "ResNet50", "ResNet101", "FPN", "Discriminator"]
