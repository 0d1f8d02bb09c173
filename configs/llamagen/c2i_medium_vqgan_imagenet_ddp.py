# LlamaGen C2I medium over the LlamaGen VQGAN tokenizer (reference
# configs/llamagen/c2i_medium_vqgan_imagenet_ddp.py). Compose the trained
# tokenizer weights at launch:
#   python -m vector_quantization_tpu.cli.train NAME THIS_CONFIG \
#       --load-model-from work_dirs/llamagen_vqgan/checkpoints/iter_400000
_base_ = ["c2i_medium_imagenet_ddp.py"]
