from .bigfile import BigFile, StreamFile, write_bigfile
