from .base import BaseTeacher, PixelTeacher
from .convnext import ConvNeXtTeacher
from .encoder import ClusterEncoder
from .vit import CLIPTeacher, DINOTeacher, MAETeacher, ViTTeacher
