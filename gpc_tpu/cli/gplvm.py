"""`gplvm` command-line tool: GP-LVM / GPDM (counterpart of gplvm.cpp).

Commands: learn / display / gnuplot (gplvm.cpp:30-44).
"""

from __future__ import annotations

import sys

import numpy as np

from gpc_tpu.cli.common import (CommandLine, ExitError, KernelSpecParser,
                                load_data, setup_jax)
from gpc_tpu import kernels as KM
from gpc_tpu.io import model_io
from gpc_tpu.models.gplvm import GPLVM


def _help():
    print("GPLVM tool (gpc_tpu).\n"
          "Commands: learn display gnuplot\n"
          "Learn options: -x latent-dim (2) -c back-kernel -D dynamics-kernel\n"
          "  -dr dynamics-SNR -ds dynamics-scale -C centre (1) -S scale (0)\n"
          "  -L learn-scales -R regularise-latent (1) -I pca|rand\n"
          "  -k kernel specs (-g/-v/-w/-b/-d/-i)  -O optimiser  -# iters\n"
          "  --checkpoint file [--checkpoint-every N] [--resume]  preemption checkpoints")


def learn(cl: CommandLine):
    cl.advance()
    cl.mode = "learn"
    ks = KernelSpecParser()
    latent_dim = 2
    centre, scale_data = True, False
    learn_scales, regularise = False, True
    init_type = "pca"
    optimiser = "scg"
    dynamics_used = False
    # the reference DEFAULTS to fixed-SNR dynamics at ratio 20 (gplvm.cpp:115,
    # 499-500, 547): any -D run freezes the dynamics kernel unless the user
    # passes -dr -1 (the ratio!=-1 escape hatch)
    dynamics_ratio = 20.0
    dynamics_scale = 0.5
    iters = 1000
    model_file = "gplvm_model"
    ckpt_path, ckpt_every, resume = None, 50, False
    while cl.is_flag():
        arg = cl.current()
        if arg in ("-?", "-h", "--help"):
            _help()
            return
        elif arg == "--checkpoint":
            # extension beyond the reference (SURVEY §5): periodic atomic
            # SCG-state checkpoints for preemption recovery ("-c" is taken
            # by back constraints here, so long-form only)
            ckpt_path = cl.get_string(); cl.advance()
        elif arg == "--checkpoint-every":
            ckpt_every = cl.get_int(); cl.advance()
        elif arg == "--resume":
            resume = True; cl.advance()
        elif arg in ("-x", "--latent-dim"):
            latent_dim = cl.get_int(); cl.advance()
        elif arg in ("-c", "--constrained"):
            ks.add_type(cl.get_string(), usage="back")
            cl.advance()
        elif arg in ("-D", "--dynamics-kernel"):
            dynamics_used = True
            ks.add_type(cl.get_string(), usage="dyn")
            cl.advance()
        elif arg in ("-dr", "--dynamics-ratio"):
            if not dynamics_used:
                raise ExitError("You need to declare a dynamics kernel before setting the dynamics signal to noise ratio. Default is 10.")
            dynamics_ratio = cl.get_double(); cl.advance()
        elif arg in ("-ds", "--dynamics-scale"):
            if not dynamics_used:
                raise ExitError("You need to declare a dynamics kernel before setting the dynamics scale.")
            dynamics_scale = cl.get_double(); cl.advance()
        elif arg in ("-C", "--Centre-data"):
            centre = cl.get_bool(); cl.advance()
        elif arg in ("-I", "--Initialise"):
            init_type = cl.get_string(); cl.advance()
        elif arg in ("-L", "--Learn-scales"):
            learn_scales = cl.get_bool(); cl.advance()
        elif arg in ("-R", "--Regularise"):
            regularise = cl.get_bool(); cl.advance()
        elif arg in ("-S", "--Scale-data"):
            scale_data = cl.get_bool(); cl.advance()
        elif arg in ("-O", "--optimiser"):
            optimiser = cl.get_string(); cl.advance()
            if optimiser not in ("scg", "conjgrad", "graddesc", "quasinew"):
                raise ExitError("Unrecognised model optimiser type.")
        elif arg in ("-#", "--#iterations"):
            iters = cl.get_int(); cl.advance()
        elif arg in ("-f", "--file-format"):
            cl.file_format = cl.get_int(); cl.advance()
        elif ks.handle(cl):
            pass
        else:
            raise ExitError(f"Unrecognised flag: {cl.current()}")
    if init_type not in ("pca", "rand"):
        raise ExitError(f"Unknown initialisation type: {init_type}")
    data_file = cl.current()
    if cl.pos + 1 < len(cl.argv):
        model_file = cl.argv[cl.pos + 1]

    Y, ylab = load_data(data_file, cl.file_format)
    # integer svml labels kept for plotting only (gplvm.cpp:342-358)
    labels = None
    if np.all(ylab == np.round(ylab)):
        labels = ylab[:, 0].astype(int)
    q = latent_dim

    # fwd kernel over latent X (input_dim = q)
    kern, kern_params = ks.build(q, usage="fwd", default_type="rbf")
    # dynamics kernel over latent X, + bias + white, SNR handling
    dyn_kern, dyn_params, dyn_learnt = None, None, True
    dyn_leaves = [t for t, u in zip(ks.types, ks.usage) if u == "dyn"]
    if dyn_leaves:
        dk, dp = ks.build(q, usage="dyn", add_bias_white=False)
        comps = list(dk.components) + [KM.Bias(input_dim=q)]
        dp = np.concatenate([dp, KM.Bias(input_dim=q).default_params()])
        dyn_kern = KM.Cmpnd(input_dim=q, components=tuple(comps))
        # setVariance(dynamicsScale²) rescales children (gplvm.cpp:498)
        import jax.numpy as jnp
        dp = np.asarray(dyn_kern.set_variance(jnp.asarray(dp), dynamics_scale ** 2))
        white = KM.White(input_dim=q)
        wp = white.default_params()
        if dynamics_ratio != -1.0:
            wp[0] = dynamics_scale / (dynamics_ratio ** 2)  # gplvm.cpp:499-500
            dyn_learnt = False                              # gplvm.cpp:547
        dyn_kern = KM.Cmpnd(input_dim=q, components=tuple(list(dyn_kern.components) + [white]))
        dyn_params = np.concatenate([dp, wp])

    # back-constraint kernel computed on Y (gplvm.cpp:527-537)
    bK = None
    back_leaves = [t for t, u in zip(ks.types, ks.usage) if u == "back"]
    if back_leaves:
        bkern, bparams = ks.build(Y.shape[1], usage="back", add_bias_white=False)
        import jax.numpy as jnp
        bK = np.array(bkern.gram(jnp.asarray(bparams), jnp.asarray(Y)))

    model = GPLVM(kern, Y, latent_dim=q, dyn_kern=dyn_kern,
                  dyn_kern_params=dyn_params, dyn_kern_learnt=dyn_learnt,
                  back_kernel_matrix=bK, centre=centre, scale_data=scale_data,
                  learn_scales=learn_scales, latent_regularised=regularise,
                  init=init_type, seed=cl.seed)
    # seed the CLI-specified kernel parameters
    import jax.numpy as jnp
    model.theta = jnp.asarray(model.spec.pack(
        kern_params,
        model.latent_X() if not model.spec.back_constrained else
        np.asarray(model.spec.unpack(model.theta)[2]),
        dyn_params=dyn_params if (dyn_kern is not None and dyn_learnt) else None,
        scales=model.fixed_scales if learn_scales else None))
    res = model.optimise(iters=iters, optimiser=optimiser, verbose=cl.verbosity,
                         ckpt_path=ckpt_path, ckpt_every=ckpt_every,
                         resume=resume)
    if cl.verbosity > 0:
        print(model.display())
        print(f"Final objective: {float(res.obj)} after {int(res.iters)} iterations")
    comment = "Run as: " + " ".join(sys.argv) + f" with seed {cl.seed}."
    model_io.write_gplvm(model_file, model, labels=labels, comment=comment)


def display(cl: CommandLine):
    cl.advance()
    model_file = cl.current() if cl.has_more() else "gplvm_model"
    model, _ = model_io.read_gplvm(model_file)
    print(model.display())


def gnuplot(cl: CommandLine):
    """Latent scatter per label + log-precision variance grid
    (gplvm.cpp:648-830, README.md:564-587)."""
    cl.advance()
    point_size, resolution = 2.0, 80
    label_file = None
    model_file, name = "gplvm_model", "gplvm"
    while cl.is_flag():
        arg = cl.current()
        if arg in ("-l", "--labels"):
            label_file = cl.get_string(); cl.advance()
        elif arg in ("-p", "--point-size"):
            point_size = cl.get_double(); cl.advance()
        elif arg in ("-r", "--resolution"):
            resolution = cl.get_int(); cl.advance()
        else:
            raise ExitError(f"Unrecognised flag: {cl.current()}")
    if cl.has_more():
        model_file = cl.current()
    if cl.pos + 1 < len(cl.argv):
        name = cl.argv[cl.pos + 1]
    model, labels = model_io.read_gplvm(model_file)
    if model.spec.latent_dim != 2:
        raise ExitError("Plotting is only implemented for 2 dimensional latent spaces.")
    if label_file:
        with open(label_file) as f:
            labels = np.array([int(ln) for ln in f if ln.strip()])
        if len(labels) != model.spec.n_data:
            raise ExitError("Incorrect number of labels")

    X = model.latent_X()
    data_files = []
    if labels is not None:
        for lab in np.unique(labels):
            sel = X[labels == lab]
            fn = f"{name}_latent_data{int(lab)}.dat"
            with open(fn, "w") as f:
                for row in sel:
                    f.write(f"{row[0]:.17e} {row[1]:.17e} 0.1\n")
            data_files.append(fn)
    else:
        fn = f"{name}_latent_data.dat"
        with open(fn, "w") as f:
            for row in X:
                f.write(f"{row[0]:.17e} {row[1]:.17e} 0.1\n")
        data_files.append(fn)

    mins, maxs = X.min(0), X.max(0)
    span = maxs - mins
    xs = np.linspace(mins[0] - 0.05 * span[0], maxs[0] + 0.05 * span[0], resolution)
    ys = np.linspace(mins[1] - 0.05 * span[1], maxs[1] + 0.05 * span[1], resolution)
    XX, YY = np.meshgrid(xs, ys)
    grid = np.column_stack([XX.ravel(), YY.ravel()])
    _, var = model.predict_from_latent(grid)
    logprec = -np.log(np.asarray(var)[:, 0]).reshape(resolution, resolution)
    with open(f"{name}_variance_matrix.dat", "w") as f:
        f.write("# Prepared plot of model file \n")
        for i in range(resolution):
            for j in range(resolution):
                f.write(f"{xs[j]:.17e} {ys[i]:.17e} {logprec[i, j]:.17e}\n")
            f.write("\n")
    with open(f"{name}_plot.gp", "w") as f:
        f.write("set pm3d map\n")
        f.write(f'splot "{name}_variance_matrix.dat"')
        for fn in data_files:
            f.write(f', "{fn}" with points ps {point_size}')
        f.write("\npause -1\n")


COMMANDS = {"learn": learn, "display": display, "gnuplot": gnuplot}


def main(argv=None):
    setup_jax()
    cl = CommandLine(argv if argv is not None else sys.argv[1:])
    cl.eat_global_flags()
    if not cl.has_more():
        _help()
        raise ExitError("No command provided.")
    np.random.seed(cl.seed % (2 ** 32))
    cmd = cl.current()
    if cmd not in COMMANDS:
        _help()
        raise ExitError(f"Invalid gplvm command provided: {cmd}")
    try:
        COMMANDS[cmd](cl)
    except FileNotFoundError as e:
        raise ExitError(f"Unable to read file {e.filename}.")
    except ValueError as e:
        raise ExitError(str(e))


if __name__ == "__main__":
    main()
