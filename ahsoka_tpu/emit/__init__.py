from ahsoka_tpu.emit.bubbleinfo import (  # noqa: F401
    write_bubbleinfo,
    write_bubbleinfo_file,
)
