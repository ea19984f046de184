# Execution-backend select — analog of the reference's Kaldi `cmd.sh`
# (`egs/lj/cmd.sh`: run.pl / slurm.pl selection). On TPU there is no
# per-GPU launcher: one process drives every local chip through the
# jax mesh, so the "backend" is just an optional submission prefix for
# each python invocation in run.sh / test.sh.
#
# Select with:  cmd_backend=local|slurm|custom
cmd_backend="${cmd_backend:-local}"

case "${cmd_backend}" in
    local)
        # run in-process on this host's chips
        cmd=""
        ;;
    slurm)
        # one task per host; every host runs the same command and joins
        # the jax.distributed coordinator (see parallel/distributed.py;
        # pass --coordinator host:port --num_hosts N --host_id $SLURM_PROCID)
        cmd="srun --ntasks-per-node=1"
        ;;
    custom)
        # set $cmd yourself before sourcing
        cmd="${cmd:-}"
        ;;
    *)
        echo "cmd.sh: unknown cmd_backend '${cmd_backend}'" >&2
        return 1
        ;;
esac
