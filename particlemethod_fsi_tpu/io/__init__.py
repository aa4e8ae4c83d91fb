from particlemethod_fsi_tpu.io.data_file import parse_data_file, write_data_file
from particlemethod_fsi_tpu.io.grid_file import GridData, read_grid_file, write_grid_file
from particlemethod_fsi_tpu.io.vtk_writer import write_vtk_file

__all__ = [
    "parse_data_file",
    "write_data_file",
    "GridData",
    "read_grid_file",
    "write_grid_file",
    "write_vtk_file",
]
