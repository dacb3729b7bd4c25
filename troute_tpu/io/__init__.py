from troute_tpu.io.netcdf import NetCDFFile, write_netcdf
from troute_tpu.io.routelink import read_lakeparm, read_routelink
from troute_tpu.io.forcing import read_qlat_chrtout, read_qlat_csv
