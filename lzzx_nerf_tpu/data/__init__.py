"""Dataset providers (reference: nerf_triplane/provider.py,
provider_for_inference.py) + synthetic data for tests/benchmarks."""

from .synthetic import SyntheticTalkingHead
