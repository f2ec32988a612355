import jax
d = jax.devices()[0]
print("default_backend:", jax.default_backend())
print("platform:", d.platform, "| device_kind:", d.device_kind, "| repr:", d)
