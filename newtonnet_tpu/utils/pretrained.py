'''Pretrained checkpoint registry (reference: newtonnet/utils/pretrained_models.py).

Downloads the published NewtonNet release checkpoints (torch pickles) into
~/.cache/newtonnet_tpu and returns the local path; torch_import converts
them on load. In offline environments the download raises with a clear
message -- pass a local path instead.
'''
import os
import zipfile
from urllib.request import urlretrieve

URLS = {
    'ani1': 'https://github.com/THGLab/NewtonNet/releases/download/pretrained/newtonnet_ani1.zip',
    'ani1x': 'https://github.com/THGLab/NewtonNet/releases/download/pretrained/newtonnet_ani1x.zip',
    't1x': 'https://github.com/THGLab/NewtonNet/releases/download/pretrained/newtonnet_t1x.zip',
}


def download_checkpoint(model: str) -> str:
    '''Download or locate a pretrained checkpoint (ref pretrained_models.py:7-43).'''
    checkpoint_url = URLS.get(model, model)
    cache_dir = os.path.expanduser('~/.cache/newtonnet_tpu')
    cached_zip_path = os.path.join(cache_dir, f'newtonnet_{model}.zip')
    cached_model_path = os.path.join(
        cache_dir, f'newtonnet_{model}/models/best_model.pt')

    if not os.path.exists(cached_model_path):
        os.makedirs(cache_dir, exist_ok=True)
        print(f'Downloading NewtonNet model from {checkpoint_url!r}')
        try:
            _, http_msg = urlretrieve(checkpoint_url, cached_zip_path)
        except OSError as e:
            raise RuntimeError(
                f'could not download {checkpoint_url} (offline?); download '
                f'manually and pass the local .pt path instead') from e
        if 'Content-Type: text/html' in str(http_msg):
            raise RuntimeError(
                f'Model download failed, please check the URL {checkpoint_url}')
        with zipfile.ZipFile(cached_zip_path, 'r') as zip_ref:
            zip_ref.extractall(cache_dir)
        os.remove(cached_zip_path)
        print(f'Cached NewtonNet model to {cached_model_path}')
    return cached_model_path
