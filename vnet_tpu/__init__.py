"""vnet_tpu — a TPU-native volumetric segmentation framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the
TF1+SimpleITK reference ``jackyko1991/vnet-tensorflow``: NIfTI data
pipelines, rank-generic V-Net/U-Net model families, Dice-family losses,
sliding-window inference with on-device blending, and SPMD parallelism over
TPU meshes.
"""

__version__ = "0.1.0"
