"""Pipeline stages (the reference's L2 stage scripts, rebuilt).

Each stage is a files-in → files-out function over a movie data dir,
plus an argparse CLI entry point compatible with the reference flags:

  - ``extract``  — decode → scene → detect → track → embed (device)
  - ``merge``    — stitch shard/block trajectories, union scene cuts
  - ``cluster``  — trajectory clustering with size constraints
  - ``classify`` — KNN actor predictions per cluster
  - ``orchestrate`` — run the stage list end to end
"""
