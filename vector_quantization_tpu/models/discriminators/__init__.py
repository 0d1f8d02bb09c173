from .patchgan import PatchGANDiscriminator
from .stylegan2 import StyleGAN2Discriminator
