from newtonnet_tpu.utils.checkpoint import load_model, save_model
