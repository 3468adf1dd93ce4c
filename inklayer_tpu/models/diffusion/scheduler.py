"""DPM-Solver++ multistep scheduler (2nd order), from the published
DPM-Solver++ algorithm (Lu et al. 2022), configured like the reference's
DPMSolverMultistepScheduler.from_config(SD1.5) (inpaint_ControlNet.py:35-37):
1000 train steps, scaled_linear betas 0.00085 -> 0.012, epsilon prediction,
solver order 2, lower-order final.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np


@dataclass
class SchedulerState:
    timesteps: np.ndarray  # (N,) int
    sigmas: np.ndarray
    step_index: int
    prev_model_outputs: list


class DPMSolverMultistepScheduler:
    def __init__(self, num_train_timesteps: int = 1000,
                 beta_start: float = 0.00085, beta_end: float = 0.012,
                 solver_order: int = 2):
        self.num_train_timesteps = num_train_timesteps
        betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                            num_train_timesteps) ** 2  # scaled_linear
        alphas = 1.0 - betas
        self.alphas_cumprod = np.cumprod(alphas)
        self.alpha_t = np.sqrt(self.alphas_cumprod)
        self.sigma_t = np.sqrt(1 - self.alphas_cumprod)
        self.lambda_t = np.log(self.alpha_t) - np.log(self.sigma_t)
        self.solver_order = solver_order
        self.init_noise_sigma = 1.0

    def set_timesteps(self, num_inference_steps: int) -> SchedulerState:
        # linspace over trained timesteps, descending (diffusers default)
        timesteps = np.linspace(
            0, self.num_train_timesteps - 1, num_inference_steps + 1
        ).round()[::-1][:-1].astype(np.int64)
        return SchedulerState(timesteps=timesteps, sigmas=None,
                              step_index=0, prev_model_outputs=[])

    def scale_model_input(self, sample, t):
        return sample  # DPM-Solver works in x-space for epsilon models

    def _to_x0(self, model_output, sample, t):
        """epsilon -> data prediction (DPM-Solver++ works on x0)."""
        a, s = self.alpha_t[t], self.sigma_t[t]
        return (sample - s * model_output) / a

    def step(self, state: SchedulerState, model_output, sample):
        """One multistep update.  model_output: epsilon at current t."""
        i = state.step_index
        t = int(state.timesteps[i])
        t_prev = int(state.timesteps[i + 1]) if i + 1 < len(state.timesteps) else 0
        x0 = self._to_x0(model_output, sample, t)

        lam_t, lam_prev = self.lambda_t[t], self.lambda_t[t_prev]
        h = lam_prev - lam_t
        a_prev, s_prev = self.alpha_t[t_prev], self.sigma_t[t_prev]
        s_t = self.sigma_t[t]

        use_first_order = (
            not state.prev_model_outputs
            or i + 1 >= len(state.timesteps)  # lower-order final step
        )
        if use_first_order:
            # DPM-Solver++(1): x_prev = (s_prev/s_t) x - a_prev (e^{-h}-1) x0
            prev = (s_prev / s_t) * sample - a_prev * (np.expm1(-h)) * x0
        else:
            x0_prev, t_last = state.prev_model_outputs[-1]
            lam_last = self.lambda_t[t_last]
            h_last = lam_t - lam_last
            r = h_last / h
            d = (1.0 / (2.0 * r)) * (x0 - x0_prev)
            prev = ((s_prev / s_t) * sample
                    - a_prev * np.expm1(-h) * x0
                    - a_prev * np.expm1(-h) * d)

        new_outputs = (state.prev_model_outputs + [(x0, t)])[-self.solver_order:]
        return prev, SchedulerState(
            timesteps=state.timesteps, sigmas=None, step_index=i + 1,
            prev_model_outputs=new_outputs)

    def add_noise(self, original, noise, t):
        return self.alpha_t[t] * original + self.sigma_t[t] * noise
