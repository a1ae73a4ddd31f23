"""Optional C++ acceleration (_fastmetrics). Import-safe when unbuilt."""

try:
    from recnet_tpu.native import _fastmetrics as fastmetrics  # type: ignore
    HAVE_FASTMETRICS = True
except ImportError:
    fastmetrics = None
    HAVE_FASTMETRICS = False
