"""Import individual torch modules from the read-only reference repo WITHOUT
executing its package __init__ (which imports unavailable deps like perth).

Used purely as a test oracle: we run the reference torch module on random
weights and check our JAX implementation reproduces it after weight
conversion. Only modules whose dependency closure is torch/numpy/scipy/einops
can be loaded this way.
"""
import sys
import types

REF_SRC = "/root/reference/src"


def _ensure_pkg(name: str, path: str):
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    m.__path__ = [path]
    m.__package__ = name
    sys.modules[name] = m
    return m


def load_ref_module(dotted: str):
    """load_ref_module('chatterbox.models.s3gen.transformer.upsample_encoder')

    Creates stub parent packages (no __init__ execution) pointing into the
    reference tree, then imports the leaf module normally so its relative
    imports resolve.
    """
    prefix = "refcb"
    parts = dotted.split(".")
    assert parts[0] == "chatterbox"
    path = f"{REF_SRC}/chatterbox"
    _ensure_pkg(prefix, path)
    full = prefix
    for part in parts[1:-1]:
        path = f"{path}/{part}"
        full = f"{full}.{part}"
        _ensure_pkg(full, path)
    import importlib
    return importlib.import_module(f"{prefix}." + ".".join(parts[1:]))
