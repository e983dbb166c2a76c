

def on_tpu() -> bool:
    """True when the default backend is a real TPU (incl. the axon relay) —
    pallas kernels run compiled there, interpret-mode elsewhere."""
    import jax
    return jax.devices()[0].platform in ("tpu", "axon")
