from .base import BaseReader, ContinuousReader
from .environment import Environment
from .analytic import (DoubleGyre, ConstantReader, OscillatingReader,
                       ArtificialOceanEddy, FailingReader, TimeseriesReader)

__all__ = ["BaseReader", "ContinuousReader", "Environment", "DoubleGyre",
           "ConstantReader", "OscillatingReader", "ArtificialOceanEddy",
           "FailingReader", "TimeseriesReader"]
