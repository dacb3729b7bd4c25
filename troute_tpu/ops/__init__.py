from troute_tpu.ops.muskingum import muskingum_cunge, MCOutput
from troute_tpu.ops.levelpool import levelpool_step, LevelpoolParams
