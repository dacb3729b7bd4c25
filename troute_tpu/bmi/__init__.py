from troute_tpu.bmi.bmi_troute import BmiTrouteTpu
