from .vqgan import VQGANDecoder, VQGANEncoder
