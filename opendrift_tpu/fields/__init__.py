from .base import BaseReader, ContinuousReader
from .environment import Environment
from .analytic import (DoubleGyre, ConstantReader, OscillatingReader,
                       ArtificialOceanEddy, FailingReader,
                       TimeseriesReader, CurrentFromTrack,
                       CurrentFromDrifter)
from .grid import StructuredGridReader, ArrayReader
from .netcdf import NetCDFReader
from .roms import ROMSReader
from .lazy import LazyReader
from .shape import ShapeReader
from .factory import reader_from_url
from .operators import (CombinedReader, ScaledReader, GaussianBlendReader,
                        combine_add, combine_sub)

__all__ = ["BaseReader", "ContinuousReader", "Environment", "DoubleGyre",
           "ConstantReader", "OscillatingReader", "ArtificialOceanEddy",
           "FailingReader", "TimeseriesReader", "CurrentFromTrack",
           "CurrentFromDrifter",
           "StructuredGridReader", "ArrayReader", "NetCDFReader",
           "ROMSReader",
           "LazyReader", "reader_from_url", "CombinedReader",
           "ScaledReader", "GaussianBlendReader", "combine_add",
           "combine_sub"]
