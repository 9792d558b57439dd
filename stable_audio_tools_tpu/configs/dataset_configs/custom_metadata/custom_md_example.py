"""Example custom-metadata module (reference configs/dataset_configs/custom_metadata).

Point a dataset config's `custom_metadata_module` at a file like this. The
function runs per sample on the host; returned keys merge into the sample
metadata (supports the __reject__ / __audio__ protocols).
"""


def get_custom_metadata(info, audio):
    # derive a prompt from the file path
    return {"prompt": info["relpath"].replace("/", ", ").rsplit(".", 1)[0]}
