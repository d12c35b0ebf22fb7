"""Native (C++) runtime components, loaded via ctypes.

The TPU compute path is JAX/XLA; the host runtime around it uses C++ where
the reference's runtime is native: the frame pump that feeds rendered
frames to the encoder without stalling the render loop (framepump.py).
Components build on first use with the toolchain's g++ and cache under
~/.cache/lzzx; everything degrades gracefully to pure-Python fallbacks.
"""

from .framepump import FramePump, native_available  # noqa: F401
