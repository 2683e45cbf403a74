"""Scale-out: device meshes, sharded bundles, batched parameter scans."""
