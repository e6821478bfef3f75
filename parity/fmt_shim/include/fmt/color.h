// Minimal no-color stand-in for fmt/color.h, just enough for the parity
// harness to compile the C++ reference against the vendored header-only
// fmt 11 core (real color.h is not bundled).  Styles are accepted and
// ignored: colored output degrades to plain text, which is exactly what
// the parity comparison wants anyway.
#ifndef FMT_SHIM_COLOR_H_
#define FMT_SHIM_COLOR_H_

#include "format.h"

FMT_BEGIN_NAMESPACE

enum class color : uint32_t {
  black = 0x000000,
  blue = 0x0000FF,
  cyan = 0x00FFFF,
  green = 0x008000,
  magenta = 0xFF00FF,
  red = 0xFF0000,
  white = 0xFFFFFF,
  yellow = 0xFFFF00,
  gray = 0x808080,
  orange = 0xFFA500,
};

struct text_style {};

inline text_style fg(color) noexcept { return {}; }
inline text_style bg(color) noexcept { return {}; }

template <typename... T>
void print(const text_style&, format_string<T...> fmt, T&&... args) {
  ::fmt::print(fmt, static_cast<T&&>(args)...);
}

template <typename... T>
void print(std::FILE* f, const text_style&, format_string<T...> fmt,
           T&&... args) {
  ::fmt::print(f, fmt, static_cast<T&&>(args)...);
}

template <typename... T>
std::string format(const text_style&, format_string<T...> fmt, T&&... args) {
  return ::fmt::format(fmt, static_cast<T&&>(args)...);
}

FMT_END_NAMESPACE

#endif  // FMT_SHIM_COLOR_H_
