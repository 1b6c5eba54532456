from .genomesim import PoissonGenomeSimulator, MarkovGenomeSimulator
from .readsim import NoisyReadSimulator

__all__ = ["PoissonGenomeSimulator", "MarkovGenomeSimulator", "NoisyReadSimulator"]
