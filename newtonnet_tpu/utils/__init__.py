from newtonnet_tpu.utils.checkpoint import load_model, save_model
from newtonnet_tpu.utils.export import (ServedModel, export_inference,
                                        save_serving_artifact)
