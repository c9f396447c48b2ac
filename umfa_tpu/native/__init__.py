"""ctypes bindings to the native runtime (native/libumfa_runtime.so)."""

from umfa_tpu.native import runtime  # noqa: F401
