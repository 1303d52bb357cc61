from graphecho_tpu.models.backbones import VGG16, ResNet, ResNet50, ResNet101
from graphecho_tpu.models.fpn import FPN
from graphecho_tpu.models.discriminator import Discriminator
from graphecho_tpu.models.attention import CrossGraph, MultiHeadAttention
from graphecho_tpu.models.affinity import Affinity
from graphecho_tpu.models.graph_matching import GModule, GroupedNodes

__all__ = ["VGG16", "ResNet", "ResNet50", "ResNet101", "FPN", "Discriminator",
           "CrossGraph", "MultiHeadAttention", "Affinity", "GModule",
           "GroupedNodes"]
