"""Exit 0 iff the TPU answers a trivial matmul quickly (relay health)."""
import jax
x = jax.numpy.ones((256, 256))
print("TPU ok", float((x @ x).sum()))
