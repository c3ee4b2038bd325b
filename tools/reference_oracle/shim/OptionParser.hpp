/* Minimal stand-in for smithlab_cpp/OptionParser.hpp supporting the subset
 * of behavior the abismal CLIs rely on.  Long options may be given with one
 * or two leading dashes; bool options toggle their value. */
#ifndef SHIM_OPTION_PARSER_HPP
#define SHIM_OPTION_PARSER_HPP

#include <cstdint>
#include <cstdlib>
#include <functional>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

class OptionParser {
public:
  OptionParser(const std::string &prog, const std::string &description,
               const std::string &usage, const int nargs = -1) :
    prog_{prog}, description_{description}, usage_{usage}, nargs_{nargs} {}

  void
  set_show_defaults() {}

  template <class T>
  void
  add_opt(const std::string &name, const char short_name,
          const std::string &desc, const bool required, T &value) {
    options_.push_back(
      {name, short_name, desc, required, false, make_setter(value),
       std::is_same<T, bool>::value});
  }

  void
  parse(const int argc, char *argv[], std::vector<std::string> &leftover) {
    leftover.clear();
    for (int i = 1; i < argc; ++i) {
      std::string a(argv[i]);
      if (a == "-help" || a == "--help" || a == "-?") {
        help_requested_ = true;
        continue;
      }
      if (a == "-about" || a == "--about") {
        about_requested_ = true;
        continue;
      }
      if (a.size() > 1 && a[0] == '-' && !is_number(a)) {
        std::string name = a.substr(a[1] == '-' ? 2 : 1);
        Opt *o = find_opt(name);
        if (!o)
          throw std::runtime_error("unrecognized option: " + a);
        o->seen = true;
        if (o->is_bool)
          o->setter("");
        else {
          if (i + 1 >= argc)
            throw std::runtime_error("missing value for option: " + a);
          o->setter(argv[++i]);
        }
      }
      else
        leftover.push_back(a);
    }
    for (const auto &o : options_)
      if (o.required && !o.seen)
        missing_.push_back(o.name);
  }

  bool
  help_requested() const {
    return help_requested_;
  }
  bool
  about_requested() const {
    return about_requested_;
  }
  bool
  option_missing() const {
    return !missing_.empty();
  }
  std::string
  option_missing_message() const {
    std::string m = "required option missing:";
    for (const auto &x : missing_)
      m += " -" + x;
    return m;
  }
  std::string
  help_message() const {
    std::string m = "Usage: " + prog_ + " [OPTIONS] " + usage_ + "\n\nOptions:\n";
    for (const auto &o : options_) {
      m += "  ";
      if (o.short_name != '\0')
        m += std::string("-") + o.short_name + ", ";
      m += "-" + o.name + "  " + o.desc + "\n";
    }
    return m;
  }
  std::string
  about_message() const {
    return prog_ + ": " + description_;
  }

private:
  struct Opt {
    std::string name;
    char short_name;
    std::string desc;
    bool required;
    bool seen;
    std::function<void(const std::string &)> setter;
    bool is_bool;
  };

  static bool
  is_number(const std::string &a) {
    // a negative numeric argument is not an option
    return a.size() > 1 &&
           (std::isdigit(static_cast<unsigned char>(a[1])) || a[1] == '.');
  }

  Opt *
  find_opt(const std::string &name) {
    for (auto &o : options_)
      if (o.name == name)
        return &o;
    if (name.size() == 1)
      for (auto &o : options_)
        if (o.short_name == name[0])
          return &o;
    return nullptr;
  }

  static std::function<void(const std::string &)>
  make_setter(bool &v) {
    return [&v](const std::string &) { v = !v; };
  }
  static std::function<void(const std::string &)>
  make_setter(char &v) {
    return [&v](const std::string &s) { v = s.empty() ? '\0' : s[0]; };
  }
  static std::function<void(const std::string &)>
  make_setter(std::string &v) {
    return [&v](const std::string &s) { v = s; };
  }
  static std::function<void(const std::string &)>
  make_setter(double &v) {
    return [&v](const std::string &s) { v = std::stod(s); };
  }
  template <class I>
  static std::function<void(const std::string &)>
  make_setter(I &v) {
    return [&v](const std::string &s) {
      v = static_cast<I>(std::stoull(s));
    };
  }

  std::string prog_;
  std::string description_;
  std::string usage_;
  int nargs_;
  std::vector<Opt> options_;
  std::vector<std::string> missing_;
  bool help_requested_{false};
  bool about_requested_{false};
};

#endif
