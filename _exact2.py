import numpy as np, jax
from volumerenderingproject_tpu import (RenderConfig, default_transfer_function, load_nifti)
from volumerenderingproject_tpu.scene.camera import Camera
from volumerenderingproject_tpu.models.raycast import render_vrc
from volumerenderingproject_tpu.ops.pallas_march import render_vrc_pallas
vol = load_nifti("/root/reference/avg152T1_LR_nifti2.nii")
tf = default_transfer_function()
cfg = RenderConfig(width=100, height=100, samples_per_ray=100)
cam = Camera.initial(position=(1.2,0.5,0.9))
b = np.asarray(jax.jit(lambda v,t,c: render_vrc(v,t,c,cfg,mode="fast"))(vol,tf,cam))
for tile in [(16,16,4),(32,32,16)]:
    a = np.asarray(jax.jit(lambda v,t,c: render_vrc_pallas(v,t,c,cfg,early_eps=0.0,tile=tile))(vol,tf,cam))
    d = abs(a-b); print(f"tile={tile}: maxdiff {d.max():.3e}  npix>1/255: {(d.max(-1)>1/255).sum()}")
