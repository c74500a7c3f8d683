from newtonnet_tpu.models.output import NewtonNet
from newtonnet_tpu.models.newtonnet import NewtonNetCore
