from .io_netcdf import write_result, read_result

__all__ = ["write_result", "read_result"]
